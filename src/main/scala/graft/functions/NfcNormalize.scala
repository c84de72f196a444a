package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * decomposition + canonical composition, UAX #15) — the first transform of
  * any text-curation pipeline ("fix mojibake before you fingerprint"):
  * visually-identical strings with different codepoint sequences (`e` +
  * U+0301 vs precomposed `é`) must hash, dedup, and shingle identically.
  *
  * Spark has no built-in for this; the JDK's `java.text.Normalizer` is the
  * same Unicode algorithm DuckDB's `nfc_normalize` (utf8proc) implements,
  * which is what makes the operator oracle-checkable byte-for-byte. The
  * call is a single static invoke from generated code, so scan→normalize→
  * project stays one whole-stage-codegen span (no UDF boundary, no
  * serialization wall).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text (ASCII is trivially NFC) — the copy
  * only happens on the rare denormalized row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize(text)` for SQL / `expr(...)` use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      { exprs =>
        require(exprs.length == 1, s"nfc_normalize takes 1 arg, got ${exprs.length}")
        NfcNormalize(exprs.head)
      },
      "built-in")

  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}
