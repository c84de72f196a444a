package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Week-2 storage pedagogy (SURVEY.md §2.1 S7): the CSV-vs-Parquet size
  * ratio the reference has learners measure (README.md:211–217, 226 —
  * "Parquet が圧倒的に小さい" / dramatically smaller).
  */
class StorageSpec extends SparkSpec {

  private def dirSize(p: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
  }

  test("parquet is materially smaller than csv for the events table") {
    val out = Files.createTempDirectory("storagespec").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.coalesce(1).write.option("header", true).csv(s"$out/csv")
    ev.coalesce(1).write.parquet(s"$out/parquet")
    val (csv, parquet) = (dirSize(s"$out/csv"), dirSize(s"$out/parquet"))
    assert(parquet.toDouble / csv < 0.8,
      s"expected parquet < 0.8x csv, got parquet=$parquet csv=$csv")
  }

  test("csv roundtrip preserves row count and values") {
    val out = Files.createTempDirectory("storagespec_rt").toString
    val ev = Tables.events(spark, sf).select(col("event_id"), col("value"))
    ev.write.option("header", true).csv(s"$out/csv")
    val back = spark.read.option("header", true)
      .schema("event_id LONG, value DOUBLE").csv(s"$out/csv")
    assert(back.count() == ev.count())
    val a = ev.agg(sum(col("event_id"))).head.getLong(0)
    val b = back.agg(sum(col("event_id"))).head.getLong(0)
    assert(a == b)
  }
}
