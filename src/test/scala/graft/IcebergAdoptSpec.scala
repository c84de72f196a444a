package graft.icelite

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IceLite.adopt]] — migrate-in of a REAL Apache Iceberg table (the
  * reverse of [[IcebergExport]], the shape of Iceberg's own `migrate`
  * action): foreign data files register in place as a live IceLite
  * table, then the lineage continues with native commits. The foreign
  * fixtures here are produced by [[IcebergExport]] — real metadata.json
  * + avro manifests over name-addressable parquet, exactly what a
  * non-IceLite writer leaves behind. */
class IcebergAdoptSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().toSeq.map(_.toSeq)

  test("adopt a foreign table, continue with append + MoR delete + rename + compaction") {
    val loc = Files.createTempDirectory("ice_adopt").toString
    // the foreign table: a real-format Iceberg export
    val src = IceLite.createFrom(spark, s"$loc/src",
      (0L until 100L).map(i => (i, s"row-$i", i * 2.0)).toDF("id", "name", "v").limit(1))
    src.append((0L until 100L).map(i => (i, s"row-$i", i * 2.0)).toDF("id", "name", "v"))
    val mj = IcebergExport.export(src, s"$loc/foreign")

    // in-place migrate: IceLite metadata lands next to the Iceberg
    // metadata, zero data movement (file paths stay the foreign ones)
    val t = IceLite.adopt(spark, mj, s"$loc/foreign")
    assert(t.read().columns.toSeq == Seq("id", "name", "v"))
    assert(rows(t.read()) == rows(IcebergInterop.read(spark, mj)),
      "at adoption, both readers must agree row-exactly")
    val adoptedPaths = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    assert(IcebergInterop.planFiles(spark, mj).map(_.path).toSet == adoptedPaths,
      "adoption must register the foreign files in place, not copy them")
    assert(t.meta.currentSnapshot.get.dataFiles.forall(_.nameMapped))

    // the lineage continues natively: append + merge-on-read delete
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((100L, "row-100", 200.0), (101L, "row-101", 202.0)).toDF("id", "name", "v"))
    t.delete(col("id") % 10 === 0)
    val got = t.read().select("id").as[Long].collect().sorted.toSeq
    val want = ((0L until 102L).filter(_ % 10 != 0)).toSeq
    assert(got == want, s"append + MoR delete over adopted files: got ${got.take(5)}…")
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty,
      "precondition: the delete really was merge-on-read over adopted files")

    // rename AFTER adoption stays metadata-only: adopted files resolve by
    // field id through the pinned adoption schema
    t.renameColumn("name", "label")
    assert(t.read().columns.toSeq == Seq("id", "label", "v"))
    assert(t.read().filter(col("label") === "row-7").count() == 1L)

    // compaction rewrites adopted files into native physical form — the
    // standard exit from name-mapped files — and rows are unchanged
    t.compact(target = 2)
    assert(t.meta.currentSnapshot.get.dataFiles.forall(!_.nameMapped),
      "compaction must leave only native files")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq == want)

    // full circle: the adopted-and-mutated table exports back to real
    // Iceberg and the independent reader agrees
    val mj2 = IcebergExport.export(t, s"$loc/re_export")
    assert(rows(IcebergInterop.read(spark, mj2)) == rows(t.read()))
  }

  test("adopt a PARTITIONED foreign table: tuples re-encode, bucket drops conservatively") {
    import java.time.LocalDate
    val loc = Files.createTempDirectory("ice_adopt_part").toString
    val src = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "region" -> "STRING", "d" -> "DATE"),
      partition = Seq("region" -> "identity", "d" -> "day"))
    val d1 = java.sql.Date.valueOf(LocalDate.of(2024, 1, 10))
    val d2 = java.sql.Date.valueOf(LocalDate.of(2024, 3, 5))
    src.append(Seq(
      (1L, "EU", d1), (2L, "EU", d2), (3L, "US", d1), (4L, "US", d2)
    ).toDF("id", "region", "d"))
    val mj = IcebergExport.export(src, s"$loc/foreign")

    val t = IceLite.adopt(spark, mj, s"$loc/adopted")
    // foreign tuples (Iceberg encodings: day = epoch days) re-encode into
    // IceLite's encodings under IceLite's spec-field names
    val tuples = t.meta.currentSnapshot.get.dataFiles.map(_.partition).toSet
    assert(tuples == Set(
      Map("region_identity" -> "EU", "d_day" -> "2024-01-10"),
      Map("region_identity" -> "EU", "d_day" -> "2024-03-05"),
      Map("region_identity" -> "US", "d_day" -> "2024-01-10"),
      Map("region_identity" -> "US", "d_day" -> "2024-03-05")), s"got $tuples")
    assert(rows(t.read()) == rows(src.read()))
    // a native append lands under the SAME spec with the same encodings
    t.append(Seq((5L, "EU", d1)).toDF("id", "region", "d"))
    val newFile = t.meta.currentSnapshot.get.dataFiles.filter(!_.nameMapped)
    assert(newFile.nonEmpty &&
      newFile.forall(_.partition == Map("region_identity" -> "EU", "d_day" -> "2024-01-10")))
    assert(t.read().count() == 5L)

    // bucket-partitioned foreign table: the tuple can't re-encode
    // (murmur3 vs xxhash64) — it drops, files stay conservatively kept
    val srcB = IceLite.create(spark, s"$loc/src_b",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"), partition = Seq("id" -> "bucket[4]"))
    srcB.append((0L until 20L).map(i => (i, i)).toDF("id", "v"))
    val mjB = IcebergExport.export(srcB, s"$loc/foreign_b")
    val tb = IceLite.adopt(spark, mjB, s"$loc/adopted_b")
    assert(tb.meta.currentSnapshot.get.dataFiles.forall(_.partition.isEmpty),
      "unconvertible bucket tuples must drop, not lie")
    assert(tb.read().count() == 20L)
    assert(rows(tb.read()) == rows(srcB.read()))
  }

  test("adoption refuses MoR-delete sources and occupied locations") {
    val loc = Files.createTempDirectory("ice_adopt_refuse").toString
    // a foreign table WITH a live position-delete manifest (hand-built,
    // the IcebergInteropSpec fixture shape)
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val entrySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        | {"name":"status","type":"int"},
        | {"name":"snapshot_id","type":"long"},
        | {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |   {"name":"content","type":"int"},
        |   {"name":"file_path","type":"string"},
        |   {"name":"file_format","type":"string"},
        |   {"name":"record_count","type":"long"},
        |   {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val mlSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        | {"name":"manifest_path","type":"string"},
        | {"name":"manifest_length","type":"long"},
        | {"name":"partition_spec_id","type":"int"},
        | {"name":"content","type":"int"},
        | {"name":"added_snapshot_id","type":"long"}]}""".stripMargin)
    def writeAvro(path: String, schema: Schema, rs: Seq[GenericRecord]): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path))
      try rs.foreach(w.append) finally w.close()
    }
    def entry(content: Int, p: String, n: Long): GenericRecord = {
      val df = new GenericData.Record(entrySchema.getField("data_file").schema())
      df.put("content", content); df.put("file_path", p)
      df.put("file_format", "PARQUET"); df.put("record_count", n)
      df.put("file_size_in_bytes", 1024L)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", 1L); e.put("data_file", df)
      e
    }
    Files.createDirectories(java.nio.file.Paths.get(s"$loc/metadata"))
    Seq((1L, "a")).toDF("id", "data").coalesce(1).write.parquet(s"$loc/data/b1")
    val dataFile = Files.list(java.nio.file.Paths.get(s"$loc/data/b1")).toArray
      .map(_.toString).find(_.endsWith(".parquet")).get
    Seq((dataFile, 0L)).toDF("file_path", "pos").coalesce(1).write.parquet(s"$loc/deletes/d1")
    val delFile = Files.list(java.nio.file.Paths.get(s"$loc/deletes/d1")).toArray
      .map(_.toString).find(_.endsWith(".parquet")).get
    writeAvro(s"$loc/metadata/m1.avro", entrySchema, Seq(entry(0, dataFile, 1)))
    writeAvro(s"$loc/metadata/dm1.avro", entrySchema, Seq(entry(1, delFile, 1)))
    def mlRow(p: String, content: Int): GenericRecord = {
      val r = new GenericData.Record(mlSchema)
      r.put("manifest_path", p); r.put("manifest_length", 512L)
      r.put("partition_spec_id", 0); r.put("content", content)
      r.put("added_snapshot_id", 1L)
      r
    }
    writeAvro(s"$loc/metadata/snap-1.avro", mlSchema,
      Seq(mlRow(s"$loc/metadata/m1.avro", 0), mlRow(s"$loc/metadata/dm1.avro", 1)))
    val mj = s"$loc/metadata/v1.metadata.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(mj),
      s"""{
         |  "format-version": 2, "location": "$loc", "last-column-id": 2,
         |  "current-schema-id": 0,
         |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "required": false, "type": "long"},
         |    {"id": 2, "name": "data", "required": false, "type": "string"}]}],
         |  "default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "current-snapshot-id": 1,
         |  "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1700000000001,
         |    "summary": {"operation": "append"}, "manifest-list": "$loc/metadata/snap-1.avro"}]
         |}""".stripMargin.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      IceLite.adopt(spark, mj, s"$loc/adopted"))
    assert(e.getMessage.contains("merge-on-read"))

    // occupied location refuses
    val ok = IceLite.createFrom(spark, s"$loc/occupied", Seq((1L, "x")).toDF("id", "data"))
    ok.append(Seq((1L, "x")).toDF("id", "data"))
    val mj2 = IcebergExport.export(ok, s"$loc/foreign_ok")
    val e2 = intercept[IllegalArgumentException](
      IceLite.adopt(spark, mj2, s"$loc/occupied"))
    assert(e2.getMessage.contains("table exists"))
  }
}
