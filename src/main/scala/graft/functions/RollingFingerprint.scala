package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: rolling polynomial document fingerprint —
  * `fold(codepoints(text), h = 0; h = (h*31 + cp) % 1e15)` as LONG.
  *
  * This replaces the composable `aggregate(transform(split(text,''), ...))`
  * formulation, whose interpreted higher-order lambdas allocate per
  * CHARACTER per row — exactly the pattern that made MinHash swing 5–35 s
  * before it was kernelized. Here the whole fold is one static JVM loop
  * over the string's UTF-8 bytes (no per-element allocation, no split
  * array), invoked from generated code so scan→project stays a single
  * whole-stage-codegen span.
  *
  * The fold runs over Unicode CODE POINTS, matching DuckDB's
  * `list_transform(string_split_regex(text,''), ch -> ascii(ch))` for all
  * of Unicode (and the previous Spark formulation on the BMP), so the
  * DuckDB oracle is unchanged. The modulus 1e15 keeps every intermediate
  * below 2^63 in both engines (DuckDB errors on BIGINT overflow rather
  * than wrapping).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(s: Any): Any =
    RollingFingerprint.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private val Mod = 1000000000000000L // every h*31+cp stays < 2^63

  /** One tight loop over UTF-8 bytes, decoding code points in place. */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) {
      val b0 = b(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); i += 4
      }
      h = (h * 31 + cp) % Mod
    }
    h
  }

  /** Register `rolling_fingerprint(text)` for SQL / `expr(...)` use.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint",
      { exprs =>
        require(exprs.length == 1, s"rolling_fingerprint takes 1 arg, got ${exprs.length}")
        RollingFingerprint(exprs.head)
      },
      "built-in")

  def rollingFingerprint(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_fingerprint", c)
}
