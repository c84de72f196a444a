package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: order-independent scaled dot product of two
  * float vectors — `sum_i round(a_i * b_i * 1e4)` as LONG.
  *
  * This is the hot kernel of the similarity operators (SURVEY.md §2.12 X3).
  * The composable formulation `aggregate(zip_with(a, b, ...))` evaluates
  * per-element through interpreted higher-order functions (an allocation
  * per lambda call); this expression generates a tight Java loop via
  * `doGenCode`, so it runs inside whole-stage codegen with zero per-element
  * allocation. Scaled-integer accumulation keeps results bit-identical
  * across engines and partitionings (see operators.VectorOps).
  */
case class DotScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_scaled expects two array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_scaled"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.round(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 10000d)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Math.round(
         |    (double) $x.getFloat($i) * (double) $y.getFloat($i) * 10000d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaled =
    copy(left = newLeft, right = newRight)
}

object DotScaled {
  /** Register `dot_scaled(a, b)` in the session's function registry so it
    * is usable from SQL and `expr(...)` (Spark 4 keeps the direct
    * Column↔Expression bridge private, so the registry IS the public
    * door). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_scaled",
      { exprs =>
        require(exprs.length == 2, s"dot_scaled takes 2 args, got ${exprs.length}")
        DotScaled(exprs.head, exprs(1))
      },
      "built-in")

  /** Column helper: registers on the session backing `a` is NOT possible
    * from here — call register(spark) once, then use this. */
  def dotScaled(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_scaled", a, b)
}
