package graft

import graft.functions.KmvKth
import org.apache.spark.sql.functions._

/** KMV sketch kernel: bounded state, distinct semantics, merge
  * associativity, and estimator accuracy on a large planted set.
  */
class KmvKthSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int) =
    KmvKth(org.apache.spark.sql.catalyst.expressions.Literal(0L), k)

  test("merge keeps only the k smallest distinct values (bounded state)") {
    val a = agg(4)
    var buf = a.createAggregationBuffer()
    // merge 1..100 twice as single-element buffers (dups must not count twice)
    for (i <- (1 to 100) ++ (1 to 100)) {
      val single = a.createAggregationBuffer()
      single.add(java.lang.Long.valueOf(i.toLong))
      buf = a.merge(buf, single)
    }
    assert(buf.size == 4, s"state must stay bounded at k, got ${buf.size}")
    assert(a.eval(buf) == 4L, "kth smallest of 1..100 at k=4 is 4")
  }

  test("serialize/deserialize round-trips and merge keeps k smallest") {
    val a = agg(3)
    val b1 = a.createAggregationBuffer()
    Seq(10L, 20L, 30L).foreach(v => b1.add(java.lang.Long.valueOf(v)))
    val b2 = a.createAggregationBuffer()
    Seq(5L, 25L, 40L).foreach(v => b2.add(java.lang.Long.valueOf(v)))
    val merged = a.merge(a.deserialize(a.serialize(b1)), b2)
    assert(merged.size == 3)
    assert(a.eval(merged) == 20L, s"k smallest of union = {5,10,20}, got $merged")
  }

  test("eval is null below k distinct values") {
    val a = agg(10)
    val buf = a.createAggregationBuffer()
    Seq(1L, 2L, 3L).foreach(v => buf.add(java.lang.Long.valueOf(v)))
    assert(a.eval(buf) == null)
  }

  test("SQL kmv_kth estimate lands within 25% of true distinct count") {
    KmvKth.register(spark)
    // 20k rows, 5k distinct ids, md5-derived 60-bit hashes
    val df = spark.range(20000).select((col("id") % 5000).as("v"))
      .select(expr("cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)").as("h"))
    val kth = df.agg(expr("kmv_kth(h, 256)")).collect().head.getLong(0)
    val est = 255.0 * 1152921504606846976.0 / kth.toDouble
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est vs 5000")
  }

  test("SQL kmv_kth is exact-null for small groups") {
    KmvKth.register(spark)
    val df = Seq(1L, 2L, 3L).toDF("h")
    val r = df.agg(expr("kmv_kth(h, 64)")).collect().head
    assert(r.isNullAt(0))
  }
}
