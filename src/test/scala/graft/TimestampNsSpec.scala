package graft

import org.apache.spark.sql.functions._

/** TIMESTAMP_NS gap handling (SURVEY.md §7.6): the raw-nanos LONG companion
  * is lossless while every TIMESTAMP path (Spark µs, DuckDB read) truncates
  * — this is the part the DuckDB oracle structurally cannot check.
  */
class TimestampNsSpec extends SparkSpec {

  test("raw nanos retain sub-microsecond precision the µs path drops") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select(col("ts").as("ns"), expr("ts div 1000").as("us"))
    val nonzeroSubMicro = raw.filter(col("ns") % 1000 =!= 0).count()
    assert(nonzeroSubMicro > 0, "fixture has no sub-µs components — test is vacuous")
    // reconstruction: µs * 1000 loses exactly the sub-µs remainder
    val lossy = raw.filter(col("us") * 1000 === col("ns")).count()
    assert(lossy == raw.count() - nonzeroSubMicro)
  }

  test("µs truncation is floor division (matches DuckDB semantics)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet").select(col("ts"))
    val bad = raw.filter(expr("ts div 1000") * 1000 > col("ts")).count()
    assert(bad == 0)
  }
}
