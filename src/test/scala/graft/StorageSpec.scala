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

  test("bloom-filter table property lands per-column bloom filters in footers") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import spark.implicits._
    val loc = Files.createTempDirectory("bloomspec").toString + "/t"
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("uid", md5(col("id").cast("string")))
      .withColumn("v", col("id") * 2)
    val t = graft.icelite.IceLite.createFrom(spark, loc, df,
      properties = Map("write.parquet.bloom-filter-enabled.column.uid" -> "true"))
    t.append(df)
    val m = t.meta
    val uidPhys = m.currentSchema.fieldByName("uid").physName
    val vPhys = m.currentSchema.fieldByName("v").physName
    val conf = spark.sessionState.newHadoopConf()
    val file = m.currentSnapshot.get.dataFiles.head.path
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    try {
      val cols = r.getFooter.getBlocks.get(0).getColumns
      def offset(phys: String) = {
        val it = cols.iterator()
        var res = -1L
        while (it.hasNext) {
          val c = it.next()
          if (c.getPath.toDotString == phys) res = c.getBloomFilterOffset
        }
        res
      }
      assert(offset(uidPhys) >= 0, "uid column should carry a bloom filter")
      assert(offset(vPhys) < 0, "v column must not carry a bloom filter")
    } finally r.close()
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
