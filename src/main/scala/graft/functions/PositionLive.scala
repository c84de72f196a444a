package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership test, codegen'd: `(file, pos)` is alive iff
  * the broadcast per-file sorted-position array does not contain `pos`.
  *
  * This is the merge-on-read read-path filter (IceLiteTable.scanSnapshot):
  * a Scala UDF here would cut the whole-stage-codegen span right after the
  * vectorized parquet scan and pay boxing + Row conversion per row; this
  * expression generates a HashMap probe + `Arrays.binarySearch` inline, so
  * scan→filter→downstream stays one codegen stage. The map is keyed by
  * UTF8String (the scan's native string type — no per-row String
  * conversion) and rides an ordinary broadcast to every executor.
  */
case class PositionLive(
    left: Expression, right: Expression,
    positions: Broadcast[java.util.HashMap[UTF8String, Array[Long]]])
    extends BinaryExpression with Predicate {

  override def prettyName: String = "position_live"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"position_live needs (STRING, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")

  /** Null-safe and total: an (impossible) null lineage value reads as
    * alive — deletion may only ever suppress explicitly recorded
    * positions, never unknown rows. */
  override def eval(input: InternalRow): Any = {
    val f = left.eval(input)
    val p = right.eval(input)
    if (f == null || p == null) true
    else {
      val arr = positions.value.get(f.asInstanceOf[UTF8String])
      arr == null || java.util.Arrays.binarySearch(arr, p.asInstanceOf[Long]) < 0
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("delVectors", positions,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per generated class, not per row
    val mapVar = ctx.addMutableState("java.util.HashMap", "delMap",
      v => s"$v = (java.util.HashMap) ((${classOf[Broadcast[_]].getName}) $bcRef).value();")
    val fEv = left.genCode(ctx)
    val pEv = right.genCode(ctx)
    val arr = ctx.freshName("positions")
    ev.copy(
      code = code"""
        ${fEv.code}
        ${pEv.code}
        boolean ${ev.value} = true;
        if (!${fEv.isNull} && !${pEv.isNull}) {
          long[] $arr = (long[]) $mapVar.get(${fEv.value});
          ${ev.value} = ($arr == null) ||
            (java.util.Arrays.binarySearch($arr, ${pEv.value}) < 0);
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionLive =
    copy(left = newLeft, right = newRight)
}
