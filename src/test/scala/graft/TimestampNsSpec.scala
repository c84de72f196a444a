package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** TIMESTAMP_NS gap handling (SURVEY.md §7.6): the raw-nanos LONG companion
  * is lossless while every TIMESTAMP path (Spark µs, DuckDB read) truncates
  * — this is the part the DuckDB oracle structurally cannot check.
  *
  * The driver's testdata has shipped `events.ts` as both TIMESTAMP(NANOS)
  * and TIMESTAMP(MICROS) across vintages, so each test first checks which
  * vintage is on disk: the ns assertions only make sense on ns data (on µs
  * data the ns gap doesn't exist and we instead assert the µs path is
  * already lossless end-to-end).
  */
class TimestampNsSpec extends SparkSpec {

  private def rawEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet")
  }

  private def isNanosVintage = rawEvents.schema("ts").dataType == LongType

  test("raw nanos retain sub-microsecond precision the µs path drops") {
    if (isNanosVintage) {
      val raw = rawEvents.select(col("ts").as("ns"), expr("ts div 1000").as("us"))
      val nonzeroSubMicro = raw.filter(col("ns") % 1000 =!= 0).count()
      assert(nonzeroSubMicro > 0, "fixture has no sub-µs components — test is vacuous")
      // reconstruction: µs * 1000 loses exactly the sub-µs remainder
      val lossy = raw.filter(col("us") * 1000 === col("ns")).count()
      assert(lossy == raw.count() - nonzeroSubMicro)
    } else {
      // µs vintage: unix_micros ∘ timestamp_micros must be the identity —
      // the companion-LONG representation is lossless at source precision.
      val raw = rawEvents.select(expr("unix_micros(cast(ts as timestamp))").as("us"))
      val bad = raw.filter(expr("unix_micros(timestamp_micros(us))") =!= col("us")).count()
      assert(bad == 0)
      assert(raw.count() > 0)
    }
  }

  test("µs truncation is floor division (matches DuckDB semantics)") {
    if (isNanosVintage) {
      val raw = rawEvents.select(col("ts"))
      val bad = raw.filter(expr("ts div 1000") * 1000 > col("ts")).count()
      assert(bad == 0)
    } else {
      // µs vintage: Tables.events must surface a TIMESTAMP column whose
      // micros equal the on-disk micros exactly (no truncation occurs).
      val viaTables = Tables.events(spark, sf).select(expr("unix_micros(ts)").as("us"))
      val direct = rawEvents.select(expr("unix_micros(cast(ts as timestamp))").as("us"))
      assert(viaTables.exceptAll(direct).count() == 0)
      assert(direct.exceptAll(viaTables).count() == 0)
    }
  }
}
