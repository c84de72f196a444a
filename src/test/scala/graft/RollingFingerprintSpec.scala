package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RollingFingerprint

/** The codegen fingerprint must agree with the interpreted-HOF formulation
  * it replaced (same polynomial, same modulus) — the DuckDB oracle pins
  * the cross-engine side, this pins the intra-engine rewrite. */
class RollingFingerprintSpec extends SparkSpec {

  test("matches the aggregate(transform(split(...))) fold on real documents") {
    RollingFingerprint.register(spark)
    val hof = expr(
      """aggregate(transform(split(text, ''), ch -> ascii(ch)),
                   0L, (h, c) -> (h * 31 + c) % 1000000000000000)""")
    val mismatches = Tables.documents(spark, sf)
      .select(col("doc_id"),
        RollingFingerprint.rollingFingerprint(col("text")).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("code-point semantics: ascii, accented, CJK, empty") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000000000000L)
    for (s <- Seq("", "a", "hello world", "café", "naïve — résumé", "漢字テスト", "mixed 漢 and é"))
      assert(RollingFingerprint.hash(UTF8String.fromString(s)) == ref(s), s"for '$s'")
  }

  test("stays inside whole-stage codegen") {
    RollingFingerprint.register(spark)
    val df = Tables.documents(spark, sf)
      .select(RollingFingerprint.rollingFingerprint(col("text")).as("fp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("rolling_fingerprint")).getOrElse("")
    assert(line.contains("*("), s"fingerprint not in a codegen span:\n$plan")
  }
}
