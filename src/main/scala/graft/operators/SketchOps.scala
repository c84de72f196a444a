package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{KmvKth, MisraGries}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation. At 100 TB, `count(DISTINCT x)`
  * is one of the most expensive shapes there is — every distinct value
  * shuffles. A KMV (k-minimum-values) sketch replaces it with a bounded
  * k-element state that partial-aggregates map-side and merges
  * associatively, at ~1/sqrt(k) relative error. Unlike Spark's built-in
  * `approx_count_distinct` (HLL++ with an engine-specific hash), the hash
  * here is md5-derived, so DuckDB computes the IDENTICAL estimate and the
  * sketch is oracle-checkable — same reason minhash_signature uses md5.
  */
object SketchOps {

  /** Per-event-type distinct-user estimate from a k=64 KMV sketch, next to
    * the exact distinct count (the oracle's ground truth AND the fallback
    * for groups with < k distinct values, where the sketch IS exact).
    *
    * Estimator: E = (k-1) / (kth/2^60) with kth the k-th smallest distinct
    * 60-bit hash — plain double arithmetic on both engines, bit-identical.
    * The aggregation runs as a native TypedImperativeAggregate
    * ([[graft.functions.KmvKth]]) with O(k) state per group per partition.
    */
  private val kmvDistinct = QueryDef(
    "kmv_distinct",
    (s, dir) => {
      KmvKth.register(s)
      val h = Tables.events(s, dir).select(col("event_type"),
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)")
          .as("h"))
      h.groupBy("event_type")
        .agg(countDistinct(col("h")).cast("long").as("exact_ndv"),
          expr("kmv_kth(h, 64)").as("kth"))
        .select(col("event_type"), col("exact_ndv"),
          when(col("kth").isNull, col("exact_ndv").cast("double"))
            .otherwise(round(
              lit(63.0d * 1152921504606846976.0d) / col("kth").cast("double"), 2))
            .as("est_ndv"))
        .orderBy("event_type")
    },
    Some("""WITH h AS (
              SELECT event_type,
                     CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM events)
            SELECT event_type,
                   CAST(count(DISTINCT h) AS BIGINT) AS exact_ndv,
                   CASE WHEN count(DISTINCT h) < 64
                        THEN CAST(count(DISTINCT h) AS DOUBLE)
                        ELSE round(63.0 * 1152921504606846976.0 /
                               (list_sort(list_distinct(list(h))))[64], 2)
                   END AS est_ndv
            FROM h GROUP BY event_type ORDER BY event_type"""),
  )

  /** Heavy hitters, two-pass: a Misra-Gries sketch (31 counters, O(k)
    * state shuffled instead of every distinct key) proposes candidates,
    * an exact count over just those candidates filters to keys with
    * freq > n/16. The MG merge guarantee (any key with freq > n/32
    * survives arbitrary merge trees) makes the verified output
    * deterministic and oracle-equal to a plain GROUP BY ... HAVING —
    * which is the point: same answer, sketch-sized shuffle. The key is
    * synthesized 70/30 skewed (events keys are uniform) so there IS a
    * heavy hitter to find.
    */
  private val heavyHitters = QueryDef(
    "heavy_hitters",
    (s, dir) => {
      MisraGries.register(s)
      val keyed = Tables.events(s, dir).select(
        when(col("event_id") % 10 < 7, -1L).otherwise(col("user_id")).as("k"))
      val scal = keyed.agg(expr("misra_gries(k, 31)").as("cands"),
        count(lit(1)).as("n"))
      keyed.join(broadcast(scal))
        .filter(array_contains(col("cands"), col("k")))
        .groupBy("k", "n").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > col("n") / 16)
        .select(col("k").as("key"), col("cnt"))
        .orderBy("key")
    },
    Some("""WITH keyed AS (
              SELECT CASE WHEN event_id % 10 < 7 THEN -1 ELSE user_id END AS key
              FROM events),
            tot AS (SELECT count(*) AS n FROM keyed)
            SELECT key, CAST(count(*) AS BIGINT) AS cnt
            FROM keyed, tot
            GROUP BY key, n HAVING count(*) > n / 16 ORDER BY key"""),
  )

  /** KMV UNION — the algebra that makes bounded sketches worth having:
    * the union of two key streams' sketches IS the sketch of the union
    * (k smallest distinct hashes commute with ∪), so per-partition /
    * per-source / per-day sketches roll up without ever re-touching raw
    * data. Here: distinct customers engaged via orders (o_custkey) OR
    * events (user_id) — two tables, one O(k) state, the exact distinct
    * beside it as ground truth. Hashes are md5-derived, so DuckDB
    * recomputes the identical estimate. */
  private val kmvUnionDistinct = QueryDef(
    "kmv_union_distinct",
    (s, dir) => {
      KmvKth.register(s)
      val a = Tables.orders(s, dir).select(col("o_custkey").cast("string").as("k"))
      val b = Tables.events(s, dir).select(col("user_id").cast("string").as("k"))
      a.unionAll(b)
        .select(expr(
          "cast(conv(substring(md5(k), 1, 15), 16, 10) as bigint)").as("h"))
        .agg(countDistinct(col("h")).cast("long").as("exact_ndv"),
          expr("kmv_kth(h, 64)").as("kth"))
        .select(col("exact_ndv"),
          when(col("kth").isNull, col("exact_ndv").cast("double"))
            .otherwise(round(
              lit(63.0d * 1152921504606846976.0d) / col("kth").cast("double"), 2))
            .as("est_ndv"))
    },
    Some("""WITH u AS (
              SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
              UNION ALL SELECT CAST(user_id AS VARCHAR) FROM events),
            h AS (SELECT CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT) AS h
                  FROM u)
            SELECT CAST(count(DISTINCT h) AS BIGINT) AS exact_ndv,
                   CASE WHEN count(DISTINCT h) < 64
                        THEN CAST(count(DISTINCT h) AS DOUBLE)
                        ELSE round(63.0 * 1152921504606846976.0 /
                               (list_sort(list_distinct(list(h))))[64], 2)
                   END AS est_ndv
            FROM h"""),
  )

  val defs: Seq[QueryDef] = Seq(kmvDistinct, kmvUnionDistinct, heavyHitters)
}
