package graft

import graft.functions.DotScaled
import org.apache.spark.sql.functions._

/** Native dot_scaled expression: value correctness, SQL registration,
  * codegen/interpreted agreement, and type checking. */
class DotScaledSpec extends SparkSpec {
  import spark.implicits._

  test("dot_scaled matches the composable HOF formulation exactly") {
    DotScaled.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array[Float](), Array[Float]()),
    ).toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => round(x.cast("double") * y.cast("double") * lit(10000))),
      lit(0L), (acc, v) => acc + v.cast("long"))
    val rows = df.select(
      DotScaled.dotScaled(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch: $r"))
    assert(rows(0).getLong(0) == 320000L) // (4+10+18)*1e4
  }

  test("usable from SQL after registration") {
    DotScaled.register(spark)
    Seq((Array(1.0f, 1.0f), Array(2.0f, 2.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_scaled(a, b) AS d FROM vecs").head.getLong(0)
    assert(r == 40000L)
  }

  test("native functions are injected by the session extension (no register call)") {
    // SparkSpec's session carries IceLiteExtensions: dot_scaled,
    // rolling_fingerprint, kmv_kth, misra_gries must resolve in fresh SQL
    // without any per-query registration
    val fresh = spark.newSession() // temp functions don't carry over; injected ones do
    assert(fresh.sql(
      "SELECT dot_scaled(array(cast(1.0 as float)), array(cast(3.0 as float)))")
      .head.getLong(0) == 30000L)
    assert(fresh.sql("SELECT rolling_fingerprint('ab')").head.getLong(0) ==
      ('a'.toLong * 31 + 'b'.toLong) % 1000000000000000L)
    assert(fresh.sql("SELECT kmv_kth(h, 2) FROM (SELECT CAST(5 AS BIGINT) h UNION ALL SELECT 9)")
      .head.getLong(0) == 9L)
    assert(!fresh.sql(
      "SELECT misra_gries(x, 4) FROM (SELECT CAST(7 AS BIGINT) x UNION ALL SELECT 7)")
      .head.isNullAt(0))
  }

  test("rejects non-float-array inputs at analysis time") {
    DotScaled.register(spark)
    val bad = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception](bad.select(DotScaled.dotScaled(col("a"), col("b"))).collect())
    assert(e.getMessage.toLowerCase.contains("dot_scaled") ||
      e.getMessage.toLowerCase.contains("array<float>"))
  }
}
