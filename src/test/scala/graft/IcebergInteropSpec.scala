package graft.icelite

import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IcebergInterop]] against a fixture REAL-format Iceberg table: v2
  * metadata.json + avro manifest-list + avro manifests (the Iceberg spec's
  * field names, avro container files with embedded schemas) over real
  * parquet data files. Proves the engine's IceLite metadata design speaks
  * the format it mirrors — current read, VERSION AS OF, the snapshot log,
  * v1 inline-manifest compatibility, and the delete-manifest refusal. */
class IcebergInteropSpec extends SparkSpec {
  import spark.implicits._

  private val entrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      | {"name":"status","type":"int"},
      | {"name":"snapshot_id","type":"long"},
      | {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |   {"name":"content","type":"int"},
      |   {"name":"file_path","type":"string"},
      |   {"name":"file_format","type":"string"},
      |   {"name":"record_count","type":"long"},
      |   {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private val manifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      | {"name":"manifest_path","type":"string"},
      | {"name":"manifest_length","type":"long"},
      | {"name":"partition_spec_id","type":"int"},
      | {"name":"content","type":"int"},
      | {"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private def writeAvro(path: String, schema: Schema, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def manifestEntry(status: Int, snapId: Long, filePath: String,
      rows: Long, content: Int = 0): GenericRecord = {
    val df = new GenericData.Record(entrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", rows)
    df.put("file_size_in_bytes", 1024L)
    val e = new GenericData.Record(entrySchema)
    e.put("status", status); e.put("snapshot_id", snapId); e.put("data_file", df)
    e
  }

  private def manifestFileRow(path: String, content: Int, snapId: Long): GenericRecord = {
    val r = new GenericData.Record(manifestFileSchema)
    r.put("manifest_path", path); r.put("manifest_length", 512L)
    r.put("partition_spec_id", 0); r.put("content", content)
    r.put("added_snapshot_id", snapId)
    r
  }

  /** One real single-file parquet with (id BIGINT, data STRING). */
  private def dataFile(dir: String, name: String, ids: Range): String = {
    val out = s"$dir/$name"
    ids.map(i => (i.toLong, s"row-$i")).toDF("id", "data").coalesce(1).write.parquet(out)
    Files.list(Paths.get(out)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
  }

  private def metadataJson(loc: String, snaps: Seq[(Long, String)],
      current: Long): String =
    s"""{
       |  "format-version": 2,
       |  "table-uuid": "11111111-2222-3333-4444-555555555555",
       |  "location": "$loc",
       |  "last-sequence-number": ${snaps.size},
       |  "last-updated-ms": 1700000000000,
       |  "last-column-id": 2,
       |  "current-schema-id": 0,
       |  "schemas": [{"type": "struct", "schema-id": 0, "fields": [
       |    {"id": 1, "name": "id", "required": false, "type": "long"},
       |    {"id": 2, "name": "data", "required": false, "type": "string"}]}],
       |  "default-spec-id": 0,
       |  "partition-specs": [{"spec-id": 0, "fields": []}],
       |  "last-partition-id": 999,
       |  "default-sort-order-id": 0,
       |  "sort-orders": [{"order-id": 0, "fields": []}],
       |  "current-snapshot-id": $current,
       |  "snapshots": [${snaps.zipWithIndex.map { case ((id, ml), i) =>
            s"""{"snapshot-id": $id, "timestamp-ms": ${1700000000000L + i},
               | "sequence-number": ${i + 1}, "schema-id": 0,
               | "summary": {"operation": "append"},
               | "manifest-list": "$ml"}""".stripMargin
          }.mkString(",")}]
       |}""".stripMargin

  test("reads a real-format Iceberg v2 table: current, time travel, snapshot log") {
    val loc = Files.createTempDirectory("iceberg_fixture").toString
    Files.createDirectories(Paths.get(s"$loc/metadata"))
    val f1 = dataFile(loc, "data/b1", 0 until 50)
    val f2 = dataFile(loc, "data/b2", 50 until 100)

    // manifest 1 (snapshot 1 adds f1); manifest 2 (snapshot 2 adds f2)
    val m1 = s"$loc/metadata/m1.avro"
    writeAvro(m1, entrySchema, Seq(manifestEntry(1, 1L, f1, 50)))
    val m2 = s"$loc/metadata/m2.avro"
    writeAvro(m2, entrySchema, Seq(manifestEntry(1, 2L, f2, 50)))
    // manifest lists: snapshot 1 → [m1]; snapshot 2 → [m1(existing), m2]
    val ml1 = s"$loc/metadata/snap-1.avro"
    writeAvro(ml1, manifestFileSchema, Seq(manifestFileRow(m1, 0, 1L)))
    val ml2 = s"$loc/metadata/snap-2.avro"
    writeAvro(ml2, manifestFileSchema,
      Seq(manifestFileRow(m1, 0, 1L), manifestFileRow(m2, 0, 2L)))
    val mj = s"$loc/metadata/v2.metadata.json"
    Files.write(Paths.get(mj),
      metadataJson(loc, Seq((1L, ml1), (2L, ml2)), 2L).getBytes("UTF-8"))

    // current read = both files, Iceberg schema projection by name
    val cur = IcebergInterop.read(spark, mj)
    assert(cur.columns.toSeq == Seq("id", "data"))
    assert(cur.count() == 100L)
    assert(cur.agg(sum("id")).head.getLong(0) == (0L until 100L).sum)
    // VERSION AS OF snapshot 1 = only f1
    val asOf = IcebergInterop.readAsOf(spark, mj, 1L)
    assert(asOf.count() == 50L)
    assert(asOf.agg(max("id")).head.getLong(0) == 49L)
    // snapshot log
    assert(IcebergInterop.snapshots(mj).map(_._1) == Seq(1L, 2L))

    // a snapshot whose entry is status=2 (DELETED) drops the file
    val m3 = s"$loc/metadata/m3.avro"
    writeAvro(m3, entrySchema,
      Seq(manifestEntry(0, 1L, f1, 50), manifestEntry(2, 3L, f2, 50)))
    val ml3 = s"$loc/metadata/snap-3.avro"
    writeAvro(ml3, manifestFileSchema, Seq(manifestFileRow(m3, 0, 3L)))
    val mj3 = s"$loc/metadata/v3.metadata.json"
    Files.write(Paths.get(mj3),
      metadataJson(loc, Seq((1L, ml1), (2L, ml2), (3L, ml3)), 3L).getBytes("UTF-8"))
    assert(IcebergInterop.read(spark, mj3).count() == 50L,
      "a status=2 manifest entry removes its file from the scan")

    // a DELETE manifest (content=1) in the selected snapshot must refuse,
    // not silently resurrect MoR-deleted rows
    val ml4 = s"$loc/metadata/snap-4.avro"
    writeAvro(ml4, manifestFileSchema,
      Seq(manifestFileRow(m1, 0, 1L), manifestFileRow(m2, 1, 4L)))
    val mj4 = s"$loc/metadata/v4.metadata.json"
    Files.write(Paths.get(mj4),
      metadataJson(loc, Seq((4L, ml4)), 4L).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](IcebergInterop.read(spark, mj4))
    assert(e.getMessage.contains("DELETE manifests"))
  }

  test("reads an Iceberg v1 table (single schema, inline manifest list)") {
    val loc = Files.createTempDirectory("iceberg_v1").toString
    Files.createDirectories(Paths.get(s"$loc/metadata"))
    val f1 = dataFile(loc, "data/b1", 0 until 30)
    val m1 = s"$loc/metadata/m1.avro"
    writeAvro(m1, entrySchema, Seq(manifestEntry(1, 1L, f1, 30)))
    val mj = s"$loc/metadata/v1.metadata.json"
    Files.write(Paths.get(mj),
      s"""{
         |  "format-version": 1,
         |  "location": "$loc",
         |  "last-updated-ms": 1700000000000,
         |  "last-column-id": 2,
         |  "schema": {"type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": false, "type": "long"},
         |    {"id": 2, "name": "data", "required": false, "type": "string"}]},
         |  "partition-spec": [],
         |  "current-snapshot-id": 1,
         |  "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1700000000001,
         |    "summary": {"operation": "append"}, "manifests": ["$m1"]}]
         |}""".stripMargin.getBytes("UTF-8"))
    val got = IcebergInterop.read(spark, mj)
    assert(got.count() == 30L)
    assert(got.filter(col("data") === "row-7").count() == 1L)
    assert(IcebergInterop.snapshots(mj) == Seq((1L, 1700000000001L, "append")))
  }
}
