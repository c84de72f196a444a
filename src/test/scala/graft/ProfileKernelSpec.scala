package graft

import org.apache.spark.sql.functions._

import graft.operators.ProfileKernel

/** The table_profile NDV cap (round-8 verdict ask #1): profiling a
  * column whose NDV ≈ row count must not ship O(rows) driver bytes.
  * Partials carry ≤ cap entries per column, the merged NDV degrades to
  * a deterministic md5-KMV estimate, and low-NDV columns stay exact. */
class ProfileKernelSpec extends SparkSpec {

  private val cap = 256

  private def orderkeys = Tables.lineitem(spark, sf)
    .select(col("l_orderkey").cast("double"), col("l_returnflag").cast("string"))

  test("partials carry at most cap entries per column, even at NDV ~ rows") {
    val ps = ProfileKernel.partials(orderkeys, Array(true, false), cap)
    assert(ps.nonEmpty)
    ps.foreach { case (_, cols) =>
      cols.foreach { c =>
        assert(c.exact == null || c.kmvHex == null, "partial carries both forms")
        val carried = Option(c.exact).map(_.length).getOrElse(0) +
          Option(c.kmvHex).map(_.length).getOrElse(0)
        assert(carried <= cap, s"partial carries $carried > cap=$cap entries")
      }
    }
    // the high-NDV column must actually have overflowed somewhere — the
    // bound above is vacuous if every partition stayed under cap
    val trueNdv = Tables.lineitem(spark, sf).select("l_orderkey").distinct.count
    assert(trueNdv > cap, s"fixture too small to exercise the cap (ndv=$trueNdv)")
  }

  test("high-NDV column degrades to a KMV estimate within 30%; low-NDV stays exact") {
    val (n, stats) = ProfileKernel.profile(orderkeys, Array(true, false), cap)
    assert(n == Tables.lineitem(spark, sf).count)
    val trueNdv = Tables.lineitem(spark, sf).select("l_orderkey").distinct.count
    val ok = stats(0)
    assert(ok.ndvKind == "estimate", s"expected estimate past cap, got ${ok.ndvKind}")
    val relErr = math.abs(ok.ndv - trueNdv).toDouble / trueNdv
    assert(relErr < 0.30, s"KMV estimate ${ok.ndv} vs true $trueNdv (relErr=$relErr)")
    // min/max stay exact regardless of the distinct tracker's state
    val trueMin = Tables.lineitem(spark, sf)
      .agg(min(col("l_orderkey").cast("double"))).head.getDouble(0)
    assert(ok.minD.doubleValue == trueMin)
    val rf = stats(1)
    assert(rf.ndvKind == "exact" && rf.ndv == 3L, s"returnflag: $rf")
  }

  test("the estimate is deterministic across runs and partitionings") {
    val a = ProfileKernel.profile(orderkeys, Array(true, false), cap)._2(0).ndv
    val b = ProfileKernel.profile(orderkeys.repartition(7), Array(true, false), cap)._2(0).ndv
    assert(a == b, s"KMV estimate depends on partitioning: $a vs $b")
  }
}
