package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Statistics & data-quality operators (SURVEY.md §2.12 extensions) — the
  * validation/profiling layer a production pipeline runs before and after
  * every ingest (the Deequ/"expectations" shape).
  *
  * Scale design: every check is a partial-aggregable expression over one
  * scan of its table; the only join (referential integrity) broadcasts the
  * dimension-side key set. Violation COUNTS travel, never violating rows.
  */
object QualityOps {

  /** Constraint audit over `orders`: completeness, range, uniqueness,
    * domain membership, referential integrity. One aggregate pass computes
    * the four row-local checks; uniqueness is its own two-level distinct
    * aggregate; RI is a broadcast anti-join against customer keys (at
    * 100 TB the fact side partial-counts in place — no fact shuffle). */
  private val expectationsCheck = QueryDef(
    "expectations_check",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val row = o.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_totalprice") < 0d || col("o_totalprice") > 1000000d, 1L)
          .otherwise(0L)).as("range_price"),
        sum(when(col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 0L)
          .otherwise(1L)).as("domain_priority")).head
      val n = row.getAs[Long]("n")
      val dupKeys = n - o.select(countDistinct(col("o_orderkey"))).head.getLong(0)
      val orphans = o.join(
          broadcast(Tables.customer(s, dir).select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .count()
      Seq(
        ("domain_orderpriority", n, row.getAs[Long]("domain_priority")),
        ("not_null_custkey", n, row.getAs[Long]("null_custkey")),
        ("range_totalprice", n, row.getAs[Long]("range_price")),
        ("ri_custkey_in_customer", n, orphans),
        ("unique_orderkey", n, dupKeys))
        .toDF("check_name", "n_checked", "n_violations")
        .withColumn("passed", col("n_violations") === 0L)
        .orderBy("check_name")
    },
    Some("""WITH base AS (SELECT
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
              CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS range_price,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                       THEN 0 ELSE 1 END) AS BIGINT) AS domain_priority,
              CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys
            FROM orders),
            orph AS (SELECT CAST(count(*) AS BIGINT) AS orphans FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            SELECT * FROM (
              SELECT 'domain_orderpriority' AS check_name, n AS n_checked,
                     domain_priority AS n_violations, domain_priority = 0 AS passed FROM base
              UNION ALL SELECT 'not_null_custkey', n, null_custkey, null_custkey = 0 FROM base
              UNION ALL SELECT 'range_totalprice', n, range_price, range_price = 0 FROM base
              UNION ALL SELECT 'ri_custkey_in_customer', n, orphans, orphans = 0 FROM base, orph
              UNION ALL SELECT 'unique_orderkey', n, dup_keys, dup_keys = 0 FROM base)
            ORDER BY check_name"""),
  )

  /** Equi-width histogram of o_totalprice in 10 buckets — INTEGER-exact:
    * prices are 2-decimal money, so `round(x·100)` cents are exact longs
    * and the bucket index `((cents-min)·10) div (max-min+1)` is pure
    * integer arithmetic — no float-boundary ambiguity at bucket edges on
    * any engine. Two passes: a scalar min/max agg, then one bucketing
    * scan with map-side partial counts. */
  private val histogram = QueryDef(
    "histogram",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(round(col("o_totalprice") * 100d).cast("long").as("cents"))
      val mm = o.agg(min("cents").as("lo"), max("cents").as("hi"))
      o.crossJoin(broadcast(mm))
        .selectExpr("lo", "hi", "((cents - lo) * 10) div (hi - lo + 1) AS bucket")
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), min("lo").as("min_cents"), max("hi").as("max_cents"))
        .orderBy("bucket")
    },
    Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
            mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
            SELECT CAST(((cents - lo) * 10) // (hi - lo + 1) AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(min(lo) AS BIGINT) AS min_cents, CAST(max(hi) AS BIGINT) AS max_cents
            FROM c, mm GROUP BY 1 ORDER BY bucket"""),
  )

  /** Covariance/correlation of (l_quantity, l_extendedprice) from EXACT
    * decimal moments: Σx, Σy, Σxy, Σx², Σy² are decimal sums (associative
    * — any partition order agrees), and only the final covariance/
    * correlation derivation touches doubles, as single deterministic IEEE
    * expressions over identical exact inputs (sqrt is a correctly-rounded
    * IEEE op, so corr matches bit-for-bit too). The engine-native
    * `corr()`/`covar_pop()` stream doubles and would differ across
    * partition orders — unusable under a hash-compare oracle. */
  private val covarStats = QueryDef(
    "covar_stats",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.agg(
          count(lit(1)).as("n"),
          Exact.dsum(col("l_quantity")).as("sx"),
          Exact.dsum(col("l_extendedprice")).as("sy"),
          Exact.dsum(col("l_quantity") * col("l_extendedprice"), 4).as("sxy"),
          Exact.dsum(col("l_quantity") * col("l_quantity"), 4).as("sxx"),
          Exact.dsum(col("l_extendedprice") * col("l_extendedprice"), 4).as("syy"))
        .selectExpr(
          "n",
          "round(sx, 2) AS sum_x", "round(sy, 2) AS sum_y",
          "round((sxy - sx * sy / n) / n, 4) AS covar_pop",
          "round((sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr")
    },
    Some(s"""WITH m AS (SELECT
               CAST(count(*) AS BIGINT) AS n,
               ${Exact.sqlSumRaw("l_quantity")} AS sx,
               ${Exact.sqlSumRaw("l_extendedprice")} AS sy,
               ${Exact.sqlSumRaw("l_quantity * l_extendedprice", 4)} AS sxy,
               ${Exact.sqlSumRaw("l_quantity * l_quantity", 4)} AS sxx,
               ${Exact.sqlSumRaw("l_extendedprice * l_extendedprice", 4)} AS syy
             FROM lineitem)
             SELECT n, round(sx, 2) AS sum_x, round(sy, 2) AS sum_y,
                    round((sxy - sx * sy / n) / n, 4) AS covar_pop,
                    round((sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr
             FROM m"""),
  )

  /** Snapshot-to-snapshot data diff — the reconciliation audit run after
    * every backfill/migration: key-wise compare of two table versions into
    * added / removed / changed / unchanged counts. The two "versions" are
    * deterministic slices of `orders`: the old snapshot is missing keys
    * divisible by 97 (→ added), the new one is missing keys divisible by
    * 89 (→ removed) and re-prices keys divisible by 13 (→ changed).
    *
    * Scale shape: ONE full-outer sort-merge join keyed on the primary key
    * — each side shuffles exactly once, compared columns reduce to exact
    * cents before the join so the exchange carries (key, long, string) not
    * whole rows, and only per-status COUNTS aggregate out (a 4-row
    * result); no row-level diff materializes. */
  private val tableDiff = QueryDef(
    "table_diff",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey").cast("long").as("k"),
        round(col("o_totalprice") * 100d).cast("long").as("cents"),
        col("o_orderstatus").as("st"))
      val old = o.filter(col("k") % 97L =!= 0L)
        .select(col("k"), col("cents").as("old_cents"), col("st").as("old_st"))
      val nw = o.filter(col("k") % 89L =!= 0L)
        .select(col("k"),
          when(col("k") % 13L === 0L, col("cents") + 100L).otherwise(col("cents")).as("new_cents"),
          col("st").as("new_st"))
      old.join(nw, Seq("k"), "full_outer")
        .select(
          when(col("old_cents").isNull, "added")
            .when(col("new_cents").isNull, "removed")
            .when(col("old_cents") =!= col("new_cents") || col("old_st") =!= col("new_st"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    },
    Some("""WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderstatus AS st
                   FROM orders),
            old AS (SELECT k, cents AS old_cents, st AS old_st FROM base WHERE k % 97 <> 0),
            nw AS (SELECT k, CASE WHEN k % 13 = 0 THEN cents + 100 ELSE cents END AS new_cents,
                          st AS new_st FROM base WHERE k % 89 <> 0)
            SELECT CASE WHEN old_cents IS NULL THEN 'added'
                        WHEN new_cents IS NULL THEN 'removed'
                        WHEN old_cents <> new_cents OR old_st <> new_st THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   CAST(count(*) AS BIGINT) AS n
            FROM old FULL OUTER JOIN nw USING (k)
            GROUP BY 1 ORDER BY status"""),
  )

  /** X67 z-score anomaly flags over the daily revenue series — the
    * alerting rule drift monitors actually fire on (EWMA smooths; this
    * DECIDES). Mean and variance come from EXACT decimal moment sums
    * (Σx, Σx² — associative, any partition order agrees, same recipe as
    * covar_stats), so the 2σ decision boundary is bit-identical on both
    * engines; sqrt and the final division are single correctly-rounded
    * IEEE ops. Output: every flagged day with its 1e4-scaled z-score.
    * Shape: one pre-aggregation to daily grain (the only corpus-sized
    * shuffle), one scalar moment row broadcast back — at 100 TB the
    * series stays thousands of rows regardless of event volume. */
  private val revenueAnomaly = QueryDef(
    "revenue_anomaly",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(Exact.dsum(col("value")).as("rev"))
      val m = daily.agg(
        count(lit(1)).as("n"),
        sum(col("rev").cast("decimal(28,2)")).cast("double").as("s1"),
        sum((col("rev") * col("rev")).cast("decimal(28,4)")).cast("double").as("s2"))
      daily.crossJoin(broadcast(m))
        .selectExpr("day", "rev", "s1 / n AS mu",
          "sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma")
        .filter(expr("abs(rev - mu) > 2 * sigma"))
        .selectExpr("day", "round(rev, 2) AS revenue",
          "cast(round((rev - mu) / sigma * 10000) AS BIGINT) AS z_x10000")
        .orderBy("day")
    },
    Some(s"""WITH daily AS (
               SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      ${Exact.sqlSumRaw("value")} AS rev
               FROM events GROUP BY 1),
             m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) AS s1,
                          CAST(sum(CAST(rev * rev AS DECIMAL(28,4))) AS DOUBLE) AS s2
                   FROM daily)
             SELECT day, round(rev, 2) AS revenue,
                    CAST(round((rev - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) * 10000) AS BIGINT) AS z_x10000
             FROM daily, m
             WHERE abs(rev - s1 / n) > 2 * sqrt(s2 / n - (s1 / n) * (s1 / n))
             ORDER BY day"""),
  )

  val defs: Seq[QueryDef] = Seq(expectationsCheck, histogram, covarStats, tableDiff,
    revenueAnomaly)
}
