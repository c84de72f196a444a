package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal operators — as-of join, range/band join, sessionization.
  *
  * These are the time-series primitives a training-data/event pipeline
  * reaches for right after plain joins (the reference's event table,
  * /root/reference/README.md:799–809, is exactly this shape). None exist
  * as built-in Spark operators; each is composed so the physical plan is
  * the one you'd want at 100 TB:
  *
  *   - as-of join: union + partitioned last-value carry-forward — ONE
  *     shuffle on the key, no join node at all, no range explosion;
  *   - range join: band bucketing — the dimension's ranges are exploded to
  *     covering buckets and BROADCAST, the fact side computes its bucket
  *     with a narrow map, and the non-equi predicate becomes an equi-join
  *     plus a residual filter (no BroadcastNestedLoopJoin);
  *   - sessionization: two windows over one shuffle on the key (gap flag →
  *     running sum = session id), then ordinary aggregation.
  */
object TemporalOps {

  /** As-of join (backward): for each left row, attach `payloads` from the
    * most recent right row with the same `key` and right.`time` <=
    * left.`time`. Ties on `time` include the right row (inclusive
    * semantics, like DuckDB/kdb ASOF).
    *
    * Implemented as the merge formulation, not a join: tag both sides,
    * union, carry payloads forward with `last(_, ignoreNulls = true)` over
    * (key ORDER BY time, tag) — right rows (tag 0) sort before left rows
    * (tag 1) at equal times. One hash shuffle on `key`, per-key ordering
    * local to each partition, no candidate-pair explosion — unlike a
    * range-join formulation, which degenerates quadratically. Right side
    * should be unique per (key, time) — ties within it are resolved by
    * whichever sorts last, so pre-aggregate.
    *
    * SKEW CAVEAT: partitionBy(key) serializes each key on one reducer.
    * Fine for user-keyed data; a key holding a large share of rows (null
    * user, bot id) becomes a straggler at 100×. For that shape use
    * [[asofJoinSkewSafe]] — identical semantics, (key, time-bucket)
    * partitioning with a carry-in fix-up pass.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      payloads: Seq[String]): DataFrame = {
    require(payloads.nonEmpty, "asofJoin: payloads must be non-empty")
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    val l = left
      .withColumn("__tag", lit(1))
      .select(col(key) :: col(time).as("__t") :: col("__tag") ::
        leftCols.filterNot(c => c == key || c == time).map(col).toList :::
        payloads.map(p => lit(null).cast(rightSchema(p).dataType).as(p)).toList: _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(col(key) :: col(time).as("__t") :: col("__tag") ::
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)).toList :::
        payloads.map(col).toList: _*)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col(key) :: col("__t") :: col("__tag") ::
        leftCols.filterNot(c => c == key || c == time).map(col).toList :::
        payloads.map(p =>
          last(col(p), ignoreNulls = true).over(w).as(p)).toList: _*)
    carried.filter(col("__tag") === 1)
      .drop("__tag")
      .withColumnRenamed("__t", time)
      .select(leftCols.map(col) ++ payloads.map(col): _*)
  }

  /** Quantile cut points over the union of both sides' time columns —
    * the bucket boundaries for [[asofJoinSkewSafe]]. Monotone numeric
    * image: dates → days, timestamps → micros, numerics → double. */
  private[graft] def timeBuckets(left: DataFrame, right: DataFrame, time: String,
      buckets: Int): Seq[Double] = {
    val samples = left.select(timeNum(left, time).as("__tn"))
      .unionAll(right.select(timeNum(right, time).as("__tn")))
    samples.stat.approxQuantile("__tn",
      (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted.toSeq
  }

  private[graft] def timeNum(df: DataFrame, time: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(time).dataType match {
      case DateType => unix_date(col(time)).cast("double")
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(col(time).cast("timestamp")).cast("double")
      case _ => col(time).cast("double")
    }
  }

  /** Bucket index of `c` given sorted boundaries: count of bounds ≤ c —
    * a codegen'd comparison chain (≤ buckets-1 compares per row), no
    * interpreted HOF in the hot path. */
  private[graft] def bucketExpr(bounds: Seq[Double], c: Column): Column =
    bounds.map(b => when(c >= lit(b), 1).otherwise(0))
      .reduceOption((a, b) => a + b).getOrElse(lit(0))

  /** Skew-safe as-of join: same semantics as [[asofJoin]], but the carry
    * window partitions on (key, time-bucket) instead of key alone, so a
    * hot key (null user, bot id) spreads over `buckets` reducers instead
    * of serializing on one. Two passes:
    *
    *  1. bucket both sides by global time quantiles (one cheap sketch
    *     pass), window per (key, bucket) as usual;
    *  2. fix up bucket boundaries: the last right row of every
    *     (key, bucket) — a tiny table, ≤ occupied-buckets rows per key —
    *     is carried forward across buckets with a window over that SMALL
    *     table, then re-injected as a synthetic earliest row per bucket.
    *
    * Shuffle volume is unchanged (one pass over the union + one over the
    * per-bucket digest); the max rows per reducer drops from
    * max-key-count to ~max-key-count/buckets for a time-uniform hot key.
    * (A hot key also CONCENTRATED in time would need per-key quantiles —
    * same shape, boundaries keyed by key.) Quantile boundaries are data-
    * dependent but the OUTPUT is boundary-invariant: every (key, bucket)
    * sees exactly the rows of a contiguous time slice plus the true
    * carry-in, so results are identical to [[asofJoin]] for any bucketing.
    */
  def asofJoinSkewSafe(left: DataFrame, right: DataFrame, key: String, time: String,
      payloads: Seq[String], buckets: Int = 32): DataFrame = {
    require(payloads.nonEmpty, "asofJoinSkewSafe: payloads must be non-empty")
    val leftCols = left.columns.toSeq
    val otherCols = leftCols.filterNot(c => c == key || c == time)
    val rightSchema = right.schema
    val bounds = timeBuckets(left, right, time, buckets)

    val l = left.withColumn("__tag", lit(1))
      .select(col(key) :: col(time).as("__t") :: timeNum(left, time).as("__tn") :: col("__tag") ::
        otherCols.map(col).toList :::
        payloads.map(p => lit(null).cast(rightSchema(p).dataType).as(p)).toList: _*)
    val r = right.withColumn("__tag", lit(0))
      .select(col(key) :: col(time).as("__t") :: timeNum(right, time).as("__tn") :: col("__tag") ::
        otherCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toList :::
        payloads.map(col).toList: _*)
    val u = l.unionByName(r).withColumn("__bn", bucketExpr(bounds, col("__tn")))

    // last right row per (key, bucket) — payloads travel as ONE struct so
    // the carry-in is always a consistent single right row
    val rlast = u.filter(col("__tag") === 0)
      .groupBy(col(key), col("__bn"))
      .agg(max_by(struct(payloads.map(col): _*), col("__tn")).as("__lastp"))
    val occ = u.select(col(key), col("__bn")).distinct()
    val wCarry = Window.partitionBy(key).orderBy(col("__bn"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryRows = occ.join(rlast, Seq(key, "__bn"), "left")
      .withColumn("__carry", last(col("__lastp"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(col(key) :: lit(null).cast(left.schema(time).dataType).as("__t") ::
        lit(null).cast("double").as("__tn") :: lit(-1).as("__tag") ::
        otherCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toList :::
        payloads.map(p => col("__carry").getField(p).as(p)).toList :::
        List(col("__bn")): _*)

    // synthetic carry rows have __t null → sort first in their bucket
    val w = Window.partitionBy(col(key), col("__bn"))
      .orderBy(col("__t").asc_nulls_first, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.unionByName(carryRows)
      .select(col(key) :: col("__t") :: col("__tag") ::
        otherCols.map(col).toList :::
        payloads.map(p => last(col(p), ignoreNulls = true).over(w).as(p)).toList: _*)
    carried.filter(col("__tag") === 1)
      .drop("__tag")
      .withColumnRenamed("__t", time)
      .select(leftCols.map(col) ++ payloads.map(col): _*)
  }

  /** Band (range) join: attach to each fact row the unique band whose
    * [lo, hi) interval contains `value`. `bandsDf` needs columns
    * (label, lo, hi) with integer bounds; `bucketW` must divide every
    * bound. Bands explode to covering fixed-width buckets (broadcast), the
    * fact computes floor(value/W) with a narrow map, and the range
    * predicate becomes equi-join + residual filter — a BroadcastHashJoin,
    * never a nested loop, fact scanned once.
    */
  def bandJoin(fact: DataFrame, valueCol: String, bandsDf: DataFrame,
      bucketW: Int): DataFrame = {
    val exploded = bandsDf.select(col("label"), col("lo"), col("hi"),
      explode(sequence((col("lo") / bucketW).cast("long"),
        (col("hi") / bucketW).cast("long") - 1)).as("__bucket"))
    fact
      .withColumn("__bucket", floor(col(valueCol) / bucketW))
      .join(broadcast(exploded), "__bucket")
      .filter(col(valueCol) >= col("lo") && col(valueCol) < col("hi"))
      .drop("__bucket")
  }

  /** Sessionization: assign a session id (`sid`, 1-based per key) that
    * increments whenever consecutive events of the same `key` (ordered by
    * `timeUs` µs, tie-broken by `tieCol`) are more than `gapUs` apart.
    * Two window passes over ONE shuffle on `key`.
    */
  def sessionize(events: DataFrame, key: String, timeUs: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(timeUs), col(tieCol))
    events
      .withColumn("__new_s",
        when(col(timeUs) - lag(col(timeUs), 1).over(w) > gapUs ||
          lag(col(timeUs), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("__new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_s")
  }

  /** As-of join query: every event gets the same customer's most recent
    * order-day revenue at-or-before the event's day (DuckDB: ASOF JOIN). */
  private val asofJoinQ = QueryDef(
    "asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts").cast("date").as("day"))
      // one rate row per (customer, day): deterministic right side — ties
      // inside a day are pre-aggregated away
      val rates = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(28, 2))).as("rev"))
        .select(col("user_id"), col("day"), col("rev"),
          col("day").as("last_order_day"))
      asofJoin(ev, rates, "user_id", "day", Seq("rev", "last_order_day"))
        .select(col("event_id"), col("user_id"), col("day"),
          col("last_order_day"),
          round(col("rev").cast("double"), 2).as("last_rev"))
        .orderBy("event_id")
    },
    Some("""WITH rates AS (
              SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS day,
                     sum(CAST(o_totalprice AS DECIMAL(28,2))) AS rev
              FROM orders GROUP BY 1, 2),
            ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day FROM events)
            SELECT e.event_id, e.user_id, e.day,
                   r.day AS last_order_day,
                   round(CAST(r.rev AS DOUBLE), 2) AS last_rev
            FROM ev e ASOF LEFT JOIN rates r
              ON e.user_id = r.user_id AND e.day >= r.day
            ORDER BY e.event_id"""),
  )

  /** The same as-of query through the SKEW-SAFE two-pass path — oracle is
    * the identical DuckDB ASOF JOIN, proving the bucketed formulation is
    * output-equivalent to the single-window one at fixture scale (the
    * TemporalOpsSpec skew case proves the reducer-spread property). */
  private val asofJoinSkewQ = QueryDef(
    "asof_join_skew",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts").cast("date").as("day"))
      val rates = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(28, 2))).as("rev"))
        .select(col("user_id"), col("day"), col("rev"),
          col("day").as("last_order_day"))
      asofJoinSkewSafe(ev, rates, "user_id", "day", Seq("rev", "last_order_day"), buckets = 8)
        .select(col("event_id"), col("user_id"), col("day"),
          col("last_order_day"),
          round(col("rev").cast("double"), 2).as("last_rev"))
        .orderBy("event_id")
    },
    Some("""WITH rates AS (
              SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS day,
                     sum(CAST(o_totalprice AS DECIMAL(28,2))) AS rev
              FROM orders GROUP BY 1, 2),
            ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day FROM events)
            SELECT e.event_id, e.user_id, e.day,
                   r.day AS last_order_day,
                   round(CAST(r.rev AS DOUBLE), 2) AS last_rev
            FROM ev e ASOF LEFT JOIN rates r
              ON e.user_id = r.user_id AND e.day >= r.day
            ORDER BY e.event_id"""),
  )

  /** Value bands for the range join: [lo, hi) half-open, varying widths.
    * events.value spans 0.01–490.02, so the bands cover everything. */
  private val bands: Seq[(String, Int, Int)] = Seq(
    ("b1_tiny", 0, 25), ("b2_small", 25, 75), ("b3_mid", 75, 150),
    ("b4_large", 150, 300), ("b5_huge", 300, 500))

  /** Range join query: classify each event's value into a non-uniform
    * [lo, hi) band, aggregate per band. */
  private val rangeJoinBandsQ = QueryDef(
    "range_join_bands",
    (s, dir) => {
      import s.implicits._
      val bandsDf = bands.toDF("label", "lo", "hi")
      val ev = Tables.events(s, dir).select("value")
      bandJoin(ev, "value", bandsDf, bucketW = 25)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          graft.Exact.dsumR(col("value")).as("sum_value"))
        .orderBy("label")
    },
    Some(s"""SELECT label, count(*) AS n,
                   ${graft.Exact.sqlSum("value")} AS sum_value
            FROM events e
            JOIN (VALUES ${bands.map { case (l, lo, hi) => s"('$l', $lo, $hi)" }.mkString(", ")})
                 b(label, lo, hi)
              ON e.value >= b.lo AND e.value < b.hi
            GROUP BY label ORDER BY label"""),
  )

  /** Sessionization query: >30-minute-gap sessions per user, per-user
    * session stats. Durations stay integer microseconds end-to-end (exact
    * on both engines). */
  private val sessionizeQ = QueryDef(
    "sessionize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val sess = sessionize(ev, "user_id", "us", "event_id", 30L * 60 * 1000000)
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_ev"), (max("us") - min("us")).as("dur_us"))
      sess.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_ev").as("n_events"),
          max("n_ev").as("max_sess_events"),
          sum("dur_us").as("total_sess_us"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
            flagged AS (
              SELECT user_id, event_id, us,
                     CASE WHEN us - lag(us, 1) OVER w > 1800000000
                          OR lag(us, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
            sids AS (
              SELECT user_id, us,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged),
            sess AS (
              SELECT user_id, sid, count(*) AS n_ev, max(us) - min(us) AS dur_us
              FROM sids GROUP BY 1, 2)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(n_ev) AS BIGINT) AS n_events,
                   CAST(max(n_ev) AS BIGINT) AS max_sess_events,
                   CAST(sum(dur_us) AS BIGINT) AS total_sess_us
            FROM sess GROUP BY user_id ORDER BY user_id"""),
  )

  /** X44 EWMA smoothing — exponentially-weighted moving average of daily
    * event value per event_type, the monitoring primitive behind drift /
    * anomaly alerts on pipeline metrics. The float recurrence
    * `s_t = α·x_t + (1−α)·s_{t−1}` is order-sensitive and engine-varying;
    * here α = 1/2 truncated to a 5-tap dyadic kernel
    * (16·x₀+8·x₁+4·x₂+2·x₃+x₄)/31 over exact cents — pure BIGINT lag
    * windows, bit-identical anywhere, emitted only where all 5 taps exist.
    *
    * Scale: one shuffle to (event_type, day) partial-agg'd cents, then
    * windows partitioned by event_type — each series smooths on its own
    * reducer; no global single-partition window. */
  private val ewmaSmoothQ = QueryDef(
    "ewma_smooth",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100d).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("kernel",
          col("cents") * 16L + lag("cents", 1).over(w) * 8L + lag("cents", 2).over(w) * 4L +
            lag("cents", 3).over(w) * 2L + lag("cents", 4).over(w))
        .filter(col("kernel").isNotNull)
        .selectExpr("event_type", "day", "cents", "kernel div 31 AS ewma_cents")
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM events GROUP BY 1, 2)
            SELECT event_type, day, cents,
                   (cents * 16 + lag(cents, 1) OVER w * 8 + lag(cents, 2) OVER w * 4
                    + lag(cents, 3) OVER w * 2 + lag(cents, 4) OVER w) // 31 AS ewma_cents
            FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
            QUALIFY ewma_cents IS NOT NULL
            ORDER BY event_type, day"""),
  )

  /** X58 calendar resample + forward fill — the gap-filling primitive
    * every time-series store exposes (`date_spine` / `ASOF` ffill): the
    * per-type daily revenue series is re-sampled onto the COMPLETE
    * calendar between the series' own min and max day, missing days
    * forward-filled from the last observed value and flagged. The spine
    * is generated with `sequence()` per type (one row per type explodes
    * to its day range — no driver loop, no cross join with a global
    * calendar), the fill is one `last(_, ignoreNulls)` window per type —
    * series stay on their own reducers, same posture as ewma_smooth.
    * Revenue is exact cents (BIGINT) so the carried values hash-match. */
  private val resampleFfillQ = QueryDef(
    "resample_ffill",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_id") % 97 === 0) // thin the series hard so gaps EXIST
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(round(col("value") * 100d).cast("long")).as("cents"))
      val spine = daily.groupBy("event_type")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val joined = spine.join(daily, Seq("event_type", "day"), "left")
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined
        .select(col("event_type"), col("day"),
          last(col("cents"), ignoreNulls = true).over(w).as("cents_ffill"),
          col("cents").isNull.cast("long").as("is_gap"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
            spine AS (
              SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
              FROM (SELECT event_type, min(day) AS lo, max(day) AS hi
                    FROM daily GROUP BY 1)),
            j AS (SELECT s.event_type, s.day, d.cents
                  FROM spine s LEFT JOIN daily d
                    ON d.event_type = s.event_type AND d.day = s.day)
            SELECT event_type, day,
                   CAST(last_value(cents IGNORE NULLS) OVER (
                        PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS cents_ffill,
                   CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
            FROM j ORDER BY event_type, day"""),
  )

  /** X59 SCD Type-2 dimension build — the warehouse-canonical "history
    * table from a change feed": each customer's order dates become
    * versioned validity intervals (`valid_from` = change date, `valid_to`
    * = day before the next change, open-ended current row flagged). ONE
    * shuffle on the dimension key; `lead()` per key derives the interval
    * end — no self-join, no correlated subquery (the naive formulation
    * joins the feed to itself per version). Ordering ties (same customer,
    * same date) break on o_orderkey so versions are total-ordered on both
    * engines. */
  private val scd2BuildQ = QueryDef(
    "scd2_build",
    (s, dir) => {
      val feed = Tables.orders(s, dir)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey").as("key"),
          col("o_orderdate").cast("date").as("chg"),
          col("o_orderkey").as("ver_src"),
          round(col("o_totalprice") * 100d).cast("long").as("attr_cents"))
      val w = Window.partitionBy("key").orderBy(col("chg"), col("ver_src"))
      feed
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", date_sub(lead(col("chg"), 1).over(w), 1))
        .select(col("key"), col("version"), col("attr_cents"),
          col("chg").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.cast("long").as("is_current"))
        .orderBy("key", "version")
    },
    Some("""WITH feed AS (
              SELECT o_custkey AS key, CAST(o_orderdate AS DATE) AS chg,
                     o_orderkey AS ver_src,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS attr_cents
              FROM orders WHERE o_custkey < 200)
            SELECT key,
                   CAST(row_number() OVER w AS BIGINT) AS version,
                   attr_cents,
                   chg AS valid_from,
                   lead(chg, 1) OVER w - 1 AS valid_to,
                   CAST(CASE WHEN lead(chg, 1) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
                     AS is_current
            FROM feed
            WINDOW w AS (PARTITION BY key ORDER BY chg, ver_src)
            ORDER BY key, version"""),
  )

  val defs: Seq[QueryDef] = Seq(asofJoinQ, asofJoinSkewQ, rangeJoinBandsQ, sessionizeQ,
    ewmaSmoothQ, resampleFfillQ, scd2BuildQ)
}
