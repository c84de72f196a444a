package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch: the frequent-items guarantee, the
  * mergeable-summaries correction, and bounded state.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int) =
    MisraGries(org.apache.spark.sql.catalyst.expressions.Literal(0L), k)

  private def bufOf(k: Int, items: Seq[Long]) = {
    val a = agg(k)
    var buf = a.createAggregationBuffer()
    // feed via single-element merges (exercises the merge path uniformly)
    items.foreach { v =>
      val single = a.createAggregationBuffer()
      single.put(java.lang.Long.valueOf(v), java.lang.Long.valueOf(1L))
      buf = a.merge(buf, single)
    }
    buf
  }

  test("state never exceeds k counters") {
    val buf = bufOf(4, (1L to 1000L))
    assert(buf.size <= 4, s"state grew to ${buf.size}")
  }

  test("a key with frequency > n/(k+1) always survives") {
    // 100 items: key 7 appears 40 times (> 100/5 with k=4), noise is unique
    val items = Seq.fill(40)(7L) ++ (100L until 160L)
    // worst-case-ish order: noise interleaved after the heavy key
    val buf = bufOf(4, items)
    assert(buf.containsKey(java.lang.Long.valueOf(7L)),
      s"heavy key evicted; buf=$buf")
  }

  test("merge correction subtracts the (k+1)-th largest and keeps <= k") {
    val a = agg(2)
    val b1 = a.createAggregationBuffer()
    b1.put(java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L))
    b1.put(java.lang.Long.valueOf(2L), java.lang.Long.valueOf(6L))
    val b2 = a.createAggregationBuffer()
    b2.put(java.lang.Long.valueOf(3L), java.lang.Long.valueOf(4L))
    b2.put(java.lang.Long.valueOf(4L), java.lang.Long.valueOf(2L))
    val m = a.merge(b1, b2)
    // counters 10,6,4,2 → 3rd largest = 4 → subtract: 6,2 survive for keys 1,2
    assert(m.size == 2 && m.get(1L) == 6L && m.get(2L) == 2L, s"got $m")
  }

  test("serde round-trips") {
    val a = agg(3)
    val buf = bufOf(3, Seq(1L, 1L, 2L))
    val rt = a.deserialize(a.serialize(buf))
    assert(rt == buf)
  }

  test("SQL two-pass heavy hitters equal exact GROUP BY HAVING") {
    MisraGries.register(spark)
    // 70% key -1, rest uniform over 50 keys
    val df = spark.range(5000).select(
      when(col("id") % 10 < 7, -1L).otherwise(col("id") % 50).as("k"))
    val scal = df.agg(expr("misra_gries(k, 31)").as("cands"), count(lit(1)).as("n"))
    val got = df.join(broadcast(scal))
      .filter(array_contains(col("cands"), col("k")))
      .groupBy("k", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") / 16)
      .select("k", "cnt").as[(Long, Long)].collect().toSet
    val exact = df.groupBy("k").count()
      .filter(col("count") > 5000.0 / 16)
      .as[(Long, Long)].collect().toSet
    assert(got == exact, s"sketch-verified $got vs exact $exact")
    assert(got.map(_._1) == Set(-1L))
  }
}
