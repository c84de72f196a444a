package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Static kernel for [[QuantileBucket]] — kept as an object so generated
  * code can call the static forwarder `graft.functions.ZorderBuckets.bucket`.
  */
object ZorderBuckets {
  /** Number of `bounds` strictly below `v` (bounds ascending, distinct) —
    * a binary search with the EXACT semantics of the fold it replaces
    * (`acc + when(v > b, 1).otherwise(0)` per bound). Spark's `>` uses the
    * SQL total order where NaN sorts ABOVE every double, so NaN ranks
    * `bounds.length` — not 0, as Java's `>` would give. */
  def bucket(v: Double, bounds: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return bounds.length
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Equal-frequency bucket rank of a double column against a literal sorted
  * boundary array — the z-order rewrite's per-dimension quantile bucketing
  * as ONE codegen'd expression.
  *
  * Replaces a fold of 63 chained `when(v > b, 1).otherwise(0)` additions per
  * dimension: that shape is correct but builds a ~130-node Catalyst tree
  * whose optimization + Janino compilation cost seconds of DRIVER time per
  * stage that evaluates it (range-partitioner sampling, the write stage, …)
  * — the dominant cost of `compactZOrder` at bench scale, and pure overhead
  * at any scale. Here the boundaries ride along as one referenced double[]
  * and each row pays a binary search instead of 63 sequential compares.
  *
  * Null/NaN semantics match the fold it replaces exactly: null ranks 0 and
  * NaN ranks `bounds.length` (Spark's SQL total order puts NaN above every
  * double), and the result is never null — the z-value must stay total so
  * every row lands in a file.
  */
case class QuantileBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  override def prettyName: String = "quantile_bucket"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects DOUBLE, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else ZorderBuckets.bucket(v.asInstanceOf[Double], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("qbBounds", bounds, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 :
          graft.functions.ZorderBuckets.bucket(${c.value}, $b);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
