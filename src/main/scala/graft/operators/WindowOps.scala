package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators. W1 `cumulative_revenue` (the reference's only
  * window, README.md:611–627) lives in Relational; these widen the family —
  * ranking, lag/lead, and frame-bounded aggregates are what the same users
  * reach for next, and they exercise Spark's WindowExec partition-shuffle
  * path (partitioned windows scale horizontally; only the per-key ordering
  * is local).
  */
object WindowOps {

  /** Per-customer order ranking (row_number + rank over a partitioned,
    * tie-broken ordering). */
  private val windowRank = QueryDef(
    "window_rank",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER w AS BIGINT) AS rn,
                     CAST(rank() OVER w AS BIGINT) AS rnk
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
            WHERE rn <= 3 ORDER BY o_custkey, rn"""),
  )

  /** Day-over-day revenue delta via lag() on the pre-aggregated daily
    * series (aggregate first, window over the small series — the scalable
    * order of operations). */
  private val windowLag = QueryDef(
    "window_lag",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(28,2)")).as("rev"))
      val w = Window.orderBy("day")
      daily.select(
        col("day"),
        round(col("rev").cast("double"), 2).as("revenue"),
        round((col("rev") - lag(col("rev"), 1).over(w)).cast("double"), 2).as("delta"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                     sum(CAST(value AS DECIMAL(28,2))) AS rev
              FROM events GROUP BY 1)
            SELECT day, round(CAST(rev AS DOUBLE), 2) AS revenue,
                   round(CAST(rev - lag(rev, 1) OVER (ORDER BY day) AS DOUBLE), 2) AS delta
            FROM daily ORDER BY day"""),
  )

  /** Sliding 7-day average via a rows-bounded frame over the daily series. */
  private val windowSliding = QueryDef(
    "window_sliding_avg",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(28,2)")).as("rev"),
          count(lit(1)).as("cnt"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      // cast BOTH window sums to double before dividing: decimal/bigint
      // division precision rules differ between engines; double ÷ double on
      // exact inputs is bit-identical.
      daily.select(
        col("day"),
        round(sum(col("rev")).over(w).cast("double") /
          sum(col("cnt")).over(w).cast("double"), 4).as("avg7"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                     sum(CAST(value AS DECIMAL(28,2))) AS rev, count(*) AS cnt
              FROM events GROUP BY 1)
            SELECT day,
                   round(CAST(sum(rev) OVER w AS DOUBLE) / CAST(sum(cnt) OVER w AS DOUBLE), 4) AS avg7
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY day"""),
  )

  /** Frame-variety coverage in one query over the per-type daily series:
    * RANGE frame (all days within ±2 calendar days — unlike a ROWS frame
    * it keys on the VALUE of the ordering column, so gaps in the series
    * change the window), ntile quartiles, percent_rank, and
    * first/last_value over an unbounded frame. Series are partitioned by
    * event_type, so every window runs per-type on its own reducer — no
    * single-partition window at any scale (same posture as ewma_smooth).
    * Day arithmetic is integer (epoch days), percent_rank is an exact
    * ratio of two integers rounded once — deterministic on both engines. */
  private val windowFrames = QueryDef(
    "window_frames",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast("long"))
      val range2 = Window.partitionBy("event_type").orderBy("d").rangeBetween(-2, 2)
      val full = Window.partitionBy("event_type").orderBy(col("day"))
      val unb = full.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily.select(
        col("event_type"), col("day"),
        sum("cnt").over(range2).as("cnt_5day_range"),
        ntile(4).over(full).cast("long").as("quartile"),
        round(percent_rank().over(full), 6).as("pct_rank"),
        first("day").over(unb).as("first_day"),
        last("day").over(unb).as("last_day"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2),
            d2 AS (SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS d FROM daily)
            SELECT event_type, day,
                   CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d
                        RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS cnt_5day_range,
                   CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS quartile,
                   round(percent_rank() OVER (PARTITION BY event_type ORDER BY day), 6) AS pct_rank,
                   first_value(day) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_day,
                   last_value(day) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_day
            FROM d2 ORDER BY event_type, day"""),
  )

  val defs: Seq[QueryDef] = Seq(windowRank, windowLag, windowSliding, windowFrames)
}
