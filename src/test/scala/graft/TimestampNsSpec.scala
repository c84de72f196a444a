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

  test("TIMESTAMP_NS column survives the IceLite write/DML/read cycle losslessly") {
    import graft.icelite.{IceLite, Stats}
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("tsns").toString + "/t"
    val t = IceLite.create(spark, loc,
      Seq("id" -> "BIGINT", "ts_ns" -> "TIMESTAMP_NS"))
    // nanos deliberately NOT divisible by 1000 — the bits a µs TIMESTAMP
    // column would destroy
    val rows = (0L until 100L).map(i => (i, 1700000000_000000000L + i * 1000003L))
    t.append(rows.toDF("id", "ts_ns"))
    val got = t.read().orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == rows, "sub-µs bits must survive the roundtrip")
    // declared type survives in metadata; physical carrier is BIGINT
    assert(t.meta.currentSchema.fieldByName("ts_ns").dtype == "TIMESTAMP_NS")
    // CoW delete through the ns column works and keeps exact values
    t.delete(col("ts_ns") === rows(7)._2)
    assert(t.read().count() == 99)
    assert(t.read().filter(col("id") === 7L).count() == 0)
    // long-domain stat pruning applies to the ns column like any BIGINT:
    // the filter prunes FILES (rows of surviving files still come back),
    // and the re-applied predicate is exact
    val planned = t.read(statFilters = Seq(Stats.Ge("ts_ns", rows(98)._2)))
    assert(planned.count() < 99, "stat filter on the ns column must skip files")
    assert(planned.filter(col("ts_ns") >= rows(98)._2).count() == 2)
    // a Spark TIMESTAMP source converts through unix_micros×1000, not a
    // seconds-granularity cast
    val t2 = IceLite.create(spark,
      java.nio.file.Files.createTempDirectory("tsns2").toString + "/t",
      Seq("id" -> "BIGINT", "ts_ns" -> "TIMESTAMP_NS"))
    t2.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")))
      .toDF("id", "ts_ns"))
    val ns = t2.read().head.getLong(1)
    assert(ns % 1000L == 0 && ns / 1000L ==
      java.time.LocalDateTime.parse("2024-01-02T03:04:05.123456")
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 123456L)
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
