package graft

import graft.functions.{QuantileBucket, ZorderBuckets}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.functions._

/** Round-19 optimization pin: `compactZOrder`'s per-dimension bucket rank
  * moved from a fold of 63 chained `when(v > b, 1)` additions (a ~130-node
  * tree, seconds of driver optimize+codegen per evaluating stage) to the
  * single codegen'd [[QuantileBucket]] expression. The z-order LAYOUT must
  * not move: these tests pin the new expression to the exact semantics of
  * the fold it replaced — count of boundaries strictly below the value,
  * with null and NaN ranking 0 (never null) so the z-value stays total.
  */
class QuantileBucketSpec extends SparkSpec {
  import spark.implicits._

  private def foldBucket(c: String, bounds: Array[Double]) =
    bounds.distinct.sorted.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(c).cast("double") > lit(b), 1).otherwise(0)
    }

  private def qb(c: String, bounds: Array[Double]) =
    SparkShims.columnOf(QuantileBucket(
      SparkShims.toExpression(col(c).cast("double")), bounds.distinct.sorted))

  test("QuantileBucket matches the when-chain fold on every edge shape") {
    val bounds = Array(10.0, 20.0, 20.0, 35.5, 99.0) // with a duplicate
    val vals: Seq[java.lang.Double] = Seq(
      -1e300, 9.999, 10.0, 10.0001, 20.0, 25.0, 35.5, 98.9, 99.0, 1e300,
      null, Double.NaN, Double.NegativeInfinity, Double.PositiveInfinity)
    val df = vals.toDF("v")
    val got = df.select(qb("v", bounds).as("b"), foldBucket("v", bounds).as("f"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"bucket diverged from the fold semantics: $r")
    }
  }

  test("kernel: binary search counts bounds strictly below") {
    val bounds = (1 to 63).map(_.toDouble).toArray
    assert(ZorderBuckets.bucket(0.5, bounds) == 0)
    assert(ZorderBuckets.bucket(1.0, bounds) == 0)   // strict: 1.0 > 1.0 is false
    assert(ZorderBuckets.bucket(1.5, bounds) == 1)
    assert(ZorderBuckets.bucket(63.0, bounds) == 62)
    assert(ZorderBuckets.bucket(64.0, bounds) == 63)
    // Spark's SQL total order: NaN above every double (the when-chain
    // ranked NaN past every bound; the kernel must agree)
    assert(ZorderBuckets.bucket(Double.NaN, bounds) == 63)
  }

  test("z-order rewrite still prunes both dimensions") {
    // the end-to-end property the layout exists for: after compactZOrder,
    // stat filters on EITHER column prune files (the registry query's own
    // embedded require re-checks this; here it runs at spec scale)
    val rows = Registry.queries("icelite_zorder")(spark, sf)
    assert(rows.count() > 0)
  }
}
