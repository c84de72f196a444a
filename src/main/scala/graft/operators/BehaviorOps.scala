package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-behavior analytics over the `events` stream table (SURVEY.md §2.12
  * extensions): ordered funnel conversion and retention cohorts — the two
  * queries every product-analytics engine ships first.
  *
  * Scale shape: both reduce events to user-cardinality intermediates as
  * early as possible. Stage tables / cohort maps are per-user aggregates —
  * smaller than the event log but still user-cardinality, so at 100 TB
  * they do NOT fit in a broadcast. Each stage is one user-keyed shuffle
  * (sort-merge or AQE-chosen shuffle-hash join); stages shrink
  * monotonically, so each successive shuffle moves less data, and AQE is
  * free to downgrade to a broadcast at small scale where the runtime
  * stats justify it. The fact scan itself is filtered (event_type pushed
  * to parquet) and partially aggregated before any join.
  */
object BehaviorOps {

  /** Ordered funnel signup → view → click → purchase: a user counts for
    * stage k only with an event strictly after their stage-k-1 entry time.
    * Each stage is one pushed-filter scan + user-keyed equi-join + min-agg;
    * the join strategy is left to the planner (AQE may broadcast when the
    * stage table is provably small, shuffle otherwise). */
  private val funnelStages = QueryDef(
    "funnel_stages",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      def stage(prev: DataFrame, prevT: String, typ: String, t: String): DataFrame =
        ev.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevT))
          .groupBy("user_id").agg(min("ts").as(t))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = stage(s1, "t1", "view", "t2")
      val s3 = stage(s2, "t2", "click", "t3")
      val s4 = stage(s3, "t3", "purchase", "t4")
      def cnt(df: DataFrame, i: Long, name: String): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n_users"))
      cnt(s1, 1L, "signup")
        .unionAll(cnt(s2, 2L, "view"))
        .unionAll(cnt(s3, 3L, "click"))
        .unionAll(cnt(s4, 4L, "purchase"))
        .orderBy("stage_idx")
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1),
            s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e JOIN s3 ON e.user_id = s3.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1)
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
              UNION ALL SELECT 2, 'view', count(*) FROM s2
              UNION ALL SELECT 3, 'click', count(*) FROM s3
              UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
            ORDER BY stage_idx"""),
  )

  /** Retention cohorts: users bucketed by first-seen day; distinct active
    * users per (cohort, day-offset ≤ 7). The cohort map is user-cardinality,
    * so it joins back onto the event scan via a user-keyed shuffle — never
    * a forced broadcast (at 100 TB the map itself is terabytes). */
  private val retentionCohorts = QueryDef(
    "retention_cohorts",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts").cast("date").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
      ev.join(first, "user_id")
        .select(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("day_offset"),
          col("user_id"))
        .filter(col("day_offset").between(0, 7))
        .groupBy("cohort", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort", "day_offset")
    },
    Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1)
            SELECT cohort, CAST(datediff('day', cohort, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE datediff('day', cohort, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
            GROUP BY 1, 2 ORDER BY cohort, day_offset"""),
  )

  val defs: Seq[QueryDef] = Seq(funnelStages, retentionCohorts)
}
