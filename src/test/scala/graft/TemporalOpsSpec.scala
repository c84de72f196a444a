package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the temporal operators (as-of join, band
  * join, sessionization) plus plan-shape guarantees: the as-of join must
  * compile to a window over ONE shuffle (no Join node), the band join to a
  * BroadcastHashJoin (no nested loop).
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before, inclusive on ties") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (1L, 25L, 250.0),
      (3L, 1L, 999.0)).toDF("k", "t", "price")
    val got = TemporalOps.asofJoin(left, right, "k", "t", Seq("price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 10L, Some(100.0)), // tie at t=10 → inclusive
      (1L, 20L, Some(150.0)), // 15 < 20 < 25 → 150
      (2L, 5L, None),         // no right rows for k=2 → null payload
    ), s"got $got")
  }

  /** Randomized differential: both as-of variants must equal a naive
    * per-row "latest right at-or-before" lookup on arbitrary data —
    * duplicate left times, right ties, keys missing on either side, and
    * (for the skew-safe variant) whatever bucket boundaries the quantile
    * sketch happens to pick. */
  test("asofJoin and asofJoinSkewSafe equal the naive reference on random data") {
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val nl = 30 + rnd.nextInt(120)
      val nr = 20 + rnd.nextInt(120)
      val lrows = Seq.fill(nl)((rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rrows = Seq.fill(nr)((rnd.nextInt(7).toLong, rnd.nextInt(50).toLong))
        .groupBy(x => x).keys.toSeq // unique (k, t): the documented contract
        .map { case (k, t) => (k, t, k * 1000 + t) }
      val left = lrows.toDF("k", "t", "lid")
      val right = rrows.toDF("k", "t", "price")
      def naive(k: Long, t: Long): Option[Long] =
        rrows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      val expected = lrows.map { case (k, t, lid) => (k, t, lid, naive(k, t)) }.toSet
      def resultOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      val plain = resultOf(TemporalOps.asofJoin(left, right, "k", "t", Seq("price")))
      assert(plain == expected, s"trial $trial: asofJoin != naive")
      val skewSafe = resultOf(
        TemporalOps.asofJoinSkewSafe(left, right, "k", "t", Seq("price"), buckets = 4))
      assert(skewSafe == expected, s"trial $trial: asofJoinSkewSafe != naive")
    }
  }

  test("asofJoin plan has no join node — one shuffle + window") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "p")
    val plan = TemporalOps.asofJoin(left, right, "k", "t", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert(plan.contains("Window"), s"expected window:\n$plan")
  }

  test("asofJoinSkewSafe matches asofJoin on data where one key holds 50% of rows") {
    // hot key 1 owns half the left rows; keys 2..20 share the rest.
    // right side: sparse rate changes per key.
    val left = ((0 until 500).map(i => (1L, (i * 7 % 997).toLong, s"h$i")) ++
      (0 until 500).map(i => ((2L + i % 19), (i * 13 % 997).toLong, s"c$i"))).toDF("k", "t", "tag")
    val right = (for (k <- 1L to 20L; j <- 0 until 10)
      yield (k, (j * 100).toLong, k * 1000.0 + j)).toDF("k", "t", "price")
    val plain = TemporalOps.asofJoin(left, right, "k", "t", Seq("price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).sorted
    val skewSafe = TemporalOps.asofJoinSkewSafe(left, right, "k", "t", Seq("price"), buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).sorted
    assert(skewSafe.length == 1000, s"row count ${skewSafe.length}")
    assert(plain.toSeq == skewSafe.toSeq, "skew-safe output diverged from single-window asof")
  }

  test("asofJoinSkewSafe spreads a hot key over time buckets (no single-reducer blowup)") {
    // the window's shuffle key is (k, bucket): recompute the per-group sizes
    // the skew-safe plan shuffles on and assert the hot key's 50% share is
    // split into near-even slices instead of one 500-row partition
    val left = ((0 until 500).map(i => (1L, (i * 7 % 997).toLong, s"h$i")) ++
      (0 until 500).map(i => ((2L + i % 19), (i * 13 % 997).toLong, s"c$i"))).toDF("k", "t", "tag")
    val right = (for (k <- 1L to 20L; j <- 0 until 10)
      yield (k, (j * 100).toLong, k * 1000.0 + j)).toDF("k", "t", "price")
    val bounds = TemporalOps.timeBuckets(left, right, "t", 8)
    val groups = left.select(col("k"), TemporalOps.bucketExpr(bounds, TemporalOps.timeNum(left, "t")).as("bn"))
      .groupBy("k", "bn").count().collect()
    val hot = groups.filter(_.getLong(0) == 1L).map(_.getLong(2))
    assert(hot.length >= 6, s"hot key occupies only ${hot.length} buckets")
    assert(hot.max <= 150, s"largest hot-key slice ${hot.max} rows — bucketing failed to spread the key")
  }

  test("asofJoinSkewSafe carries the last right row across empty buckets") {
    // all right rows land in the earliest bucket; left rows in later
    // buckets must still see the carry-in (t=5 → price 50)
    val left = Seq((1L, 100L, "a"), (1L, 900L, "b"), (2L, 900L, "c")).toDF("k", "t", "tag")
    val right = Seq((1L, 1L, 10.0), (1L, 5L, 50.0)).toDF("k", "t", "price")
    val got = TemporalOps.asofJoinSkewSafe(left, right, "k", "t", Seq("price"), buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 100L, Some(50.0)),
      (1L, 900L, Some(50.0)),
      (2L, 900L, None),
    ), s"got $got")
  }

  test("bandJoin classifies half-open bands via broadcast equi-join") {
    val bandsDf = Seq(("low", 0, 50), ("high", 50, 100)).toDF("label", "lo", "hi")
    val fact = Seq(0.0, 49.999, 50.0, 99.9).toDF("value")
    val got = TemporalOps.bandJoin(fact, "value", bandsDf, bucketW = 25)
      .select("value", "label").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(got == Set((0.0, "low"), (49.999, "low"), (50.0, "high"), (99.9, "high")))
    val plan = TemporalOps.bandJoin(fact, "value", bandsDf, 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nested loop leaked:\n$plan")
  }

  test("bandJoin drops values outside every band") {
    val bandsDf = Seq(("only", 0, 25)).toDF("label", "lo", "hi")
    val fact = Seq(10.0, 30.0).toDF("value")
    val got = TemporalOps.bandJoin(fact, "value", bandsDf, 25).collect()
    assert(got.length == 1 && got.head.getAs[Double]("value") == 10.0)
  }

  /** Randomized differential: session ids from the two-window formulation
    * must equal a naive sequential gap-splitter per key — including ties
    * on the timestamp (broken by the tie column) and back-to-back gaps. */
  test("sessionize equals the naive sequential splitter on random data") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(150)
      val rows = Seq.fill(n)(
        (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong * 10L))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val gap = 25L
      val got = TemporalOps.sessionize(rows.toDF("k", "t", "eid"), "k", "t", "eid", gap)
        .collect().map(r => (r.getLong(2), r.getLong(3))).toMap // eid -> sid
      rows.groupBy(_._1).foreach { case (_, ks) =>
        val ordered = ks.sortBy(e => (e._2, e._3))
        var sid = 0L; var prev = Long.MinValue
        ordered.foreach { case (_, t, eid) =>
          if (prev == Long.MinValue || t - prev > gap) sid += 1
          prev = t
          assert(got(eid) == sid, s"trial $trial eid $eid: ${got(eid)} != $sid")
        }
      }
    }
  }

  test("sessionize plan has exactly one shuffle (both windows share it)") {
    val ev = Seq((1L, 1L, 0L)).toDF("k", "id", "us")
    val plan = TemporalOps.sessionize(ev, "k", "us", "id", 100L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles:\n$plan")
  }

  test("sessionize splits on gaps strictly greater than gapUs") {
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 101L), // gap 1 ≤ 100 → same session
      (1L, 4L, 300L),                               // gap 199 > 100 → new session
      (2L, 5L, 0L),
    ).toDF("k", "id", "us")
    val got = TemporalOps.sessionize(ev, "k", "us", "id", gapUs = 100L)
      .select("k", "id", "sid").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (1L, 4L) -> 2L, (2L, 5L) -> 1L), s"got $got")
  }
}
