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

  /** X50 mergeable quantile estimation from a deterministic bottom-k
    * sample — the quantile sibling of the KMV distinct sketch. The k=256
    * rows whose (md5(order key, line number), cents) sorts first are a
    * uniform random sample of lineitem (md5 is a fixed permutation of the
    * key space; the cents tiebreak covers this data's duplicate key
    * pairs — see the comment at the sample), and
    * bottom-k-by-hash is MERGEABLE: the bottom-k of a union is the
    * bottom-k of the per-partition bottom-ks, so at 100 TB this plans as
    * TakeOrderedAndProject — each partition keeps 256 rows, the driver
    * merges partition winners, the corpus never shuffles (contrast an
    * exact percentile: global sort). Estimates are nearest-rank order
    * statistics of the sample (±~1/√k·spread); both engines recompute the
    * identical sample and ranks, so the estimate itself hash-matches —
    * unlike percentile_approx, whose sketch is engine-private.
    * SketchOpsSpec pins the estimates within tolerance of the exact
    * quantiles. */
  private val quantileSketch = QueryDef(
    "quantile_sketch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 256
      // same pre-md5 fan-out as quantile_sketch_grouped: the md5 kernel
      // over the whole table otherwise runs inside the one scan task
      val li = Tables.fanOutSmall(Tables.lineitem(s, dir).select(
          col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          s, dir, "lineitem", col("l_orderkey") * 8 + col("l_linenumber"))
        .select(
          round(col("l_extendedprice") * 100d).cast("long").as("cents"),
          md5(concat_ws(":", col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"))).as("h"))
      // (h, cents) ordering, not h alone: (l_orderkey, l_linenumber) is NOT
      // unique in this data (~20% duplicate pairs at every SF), so h has
      // ties — when the bottom-k boundary lands inside a tie group whose
      // members carry different prices, "ORDER BY h LIMIT k" lets each
      // engine keep an arbitrary member (caught as an oracle mismatch at
      // sf0.001). The cents tiebreak makes the sample a total order, so
      // both engines keep the identical k rows at every SF.
      val sample = li.orderBy("h", "cents").limit(k) // TakeOrderedAndProject: O(k) driver
      val ranked = sample.withColumn("rk",
        row_number().over(Window.orderBy(col("cents"), col("h"))).cast("long"))
      val pcts = s.createDataFrame(Seq(Tuple1(50L), Tuple1(90L), Tuple1(99L)))
        .toDF("pct")
      pcts.join(ranked,
          col("rk") === expr(s"(pct * ${k - 1}) div 100 + 1"))
        .select(col("pct"), col("cents").as("est_cents"))
        .orderBy("pct")
    },
    Some("""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h
                 FROM lineitem),
            smp AS (SELECT cents, h FROM li ORDER BY h, cents LIMIT 256),
            rk AS (SELECT cents, CAST(row_number() OVER (ORDER BY cents, h) AS BIGINT) AS rk
                   FROM smp),
            p AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS pct)
            SELECT p.pct, r.cents AS est_cents
            FROM p JOIN rk r ON r.rk = (p.pct * 255) // 100 + 1
            ORDER BY pct"""),
  )

  /** X62 per-group quantile sketch — the "p50/p99 per segment" shape ops
    * dashboards actually need: the same bottom-k-by-md5 sample rule as
    * [[quantileSketch]], but per l_returnflag. The per-group sample is a
    * row_number window over (group ORDER BY hash) capped at k — at scale
    * the window's shuffle carries the corpus once on the group key with
    * map-side rank pruning available (groups × k bounded state; the same
    * mergeable bottom-k algebra, so per-partition pre-pruning stays
    * lossless). Estimates are nearest-rank order statistics of each
    * group's sample; every step recomputed by DuckDB. */
  private val quantileSketchGrouped = QueryDef(
    "quantile_sketch_grouped",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 128
      // fan the single-split scan across cores BEFORE the md5 kernel and
      // the rank window's map-side sort — measured 1.9 s inside ONE scan
      // task on the unsplit sf0.1 file (the md5 alone is ~1.1 s of it);
      // after the fan-out both run per-partition in parallel. The fan-out
      // shuffles only the four raw columns, keyed on the already-cheap
      // primary key; no-op at scale where the scan splits natively.
      val li = Tables.fanOutSmall(Tables.lineitem(s, dir).select(
          col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber")), s, dir, "lineitem",
          col("l_orderkey") * 8 + col("l_linenumber"))
        .select(
          col("l_returnflag").as("grp"),
          round(col("l_extendedprice") * 100d).cast("long").as("cents"),
          md5(concat_ws(":", col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"))).as("h"))
      // same (h, cents) total order as quantile_sketch: h alone has ties
      // (duplicate (l_orderkey, l_linenumber) pairs in the data), and the
      // per-group k-boundary must not pick arbitrary tie members
      val sample = li.withColumn("hr",
          row_number().over(Window.partitionBy("grp").orderBy("h", "cents")).cast("long"))
        .filter(col("hr") <= k)
      val ranked = sample.withColumn("rk",
        row_number().over(Window.partitionBy("grp").orderBy(col("cents"), col("h")))
          .cast("long"))
      val pcts = s.createDataFrame(Seq(Tuple1(50L), Tuple1(99L))).toDF("pct")
      pcts.crossJoin(ranked)
        .filter(col("rk") === expr(s"(pct * ${k - 1}) div 100 + 1"))
        .select(col("grp"), col("pct"), col("cents").as("est_cents"))
        .orderBy("grp", "pct")
    },
    Some("""WITH li AS (SELECT l_returnflag AS grp,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h
                 FROM lineitem),
            smp AS (SELECT grp, cents, h FROM (
                   SELECT *, row_number() OVER (PARTITION BY grp ORDER BY h, cents) AS hr
                   FROM li) WHERE hr <= 128),
            rk AS (SELECT grp, cents,
                          CAST(row_number() OVER (PARTITION BY grp ORDER BY cents, h) AS BIGINT) AS rk
                   FROM smp),
            p AS (SELECT CAST(unnest([50, 99]) AS BIGINT) AS pct)
            SELECT r.grp, p.pct, r.cents AS est_cents
            FROM p JOIN rk r ON r.rk = (p.pct * 127) // 100 + 1
            ORDER BY grp, pct"""),
  )

  val defs: Seq[QueryDef] = Seq(kmvDistinct, kmvUnionDistinct, heavyHitters,
    quantileSketch, quantileSketchGrouped)
}
