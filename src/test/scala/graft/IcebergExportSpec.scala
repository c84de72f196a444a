package graft.icelite

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IcebergExport]]: an IceLite table materializes as a REAL-format
  * Iceberg table ([[IcebergInterop]] is the reader — so the round trip
  * proves both directions of format fidelity). Schema evolution, renames
  * and MoR deletes are resolved by the export's read path, so the output
  * is clean append-only Iceberg any reader can consume. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(df.columns.map(col).toSeq: _*).collect()
      .toSeq.map(_.toSeq)

  test("export round-trips current state and snapshot lineage through a real Iceberg reader") {
    val loc = Files.createTempDirectory("ice_export").toString
    val t = IceLite.createFrom(spark, s"$loc/src",
      Seq((1L, 10.0, "a")).toDF("id", "v", "name"))
    t.append(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "v", "name"))
    val snap1 = t.meta.currentSnapshotId.get
    t.append(Seq((3L, 30.0, "c"), (4L, 40.0, "d")).toDF("id", "v", "name"))
    val snap2 = t.meta.currentSnapshotId.get

    val mj = IcebergExport.export(t, s"$loc/exported", Seq(snap1, snap2))
    val cur = IcebergInterop.read(spark, mj)
    assert(cur.columns.toSeq == Seq("id", "v", "name"),
      "export must surface LOGICAL column names, not physical f<id>")
    assert(rows(cur) == rows(t.read()))
    // lineage: VERSION AS OF the first exported snapshot = the old state
    assert(rows(IcebergInterop.readAsOf(spark, mj, snap1)) ==
      rows(t.readAsOf(snap1)))
    assert(IcebergInterop.snapshots(mj).map(_._1) == Seq(snap1, snap2))
  }

  test("MoR deletes, defaults and renames materialize into clean append-only Iceberg") {
    val loc = Files.createTempDirectory("ice_export_evo").toString
    val t = IceLite.createFrom(spark, s"$loc/src",
      (0L until 20L).map(i => (i, i * 2.0)).toDF("id", "v").limit(1),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append((0L until 20L).map(i => (i, i * 2.0)).toDF("id", "v"))
    t.delete(col("id") % 4 === 0)
    t.addColumn("tag", "STRING", defaultSql = Some("'x'"))
    t.renameColumn("v", "value")
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty,
      "precondition: the source table really is merge-on-read")

    val mj = IcebergExport.export(t, s"$loc/exported")
    val got = IcebergInterop.read(spark, mj)
    assert(got.columns.toSeq == Seq("id", "value", "tag"))
    assert(got.count() == 15L)
    assert(got.filter(col("id") % 4 === 0).count() == 0L,
      "MoR deletes must be materialized into the export")
    assert(got.select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("x"),
      "read-time defaults must be materialized into the export")
    assert(rows(got) == rows(t.read()))
  }

  test("TIMESTAMP_NS exports as the V3 timestamp_ns type over its nanos carrier") {
    val loc = Files.createTempDirectory("ice_export_ns").toString
    val t = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "ts" -> "TIMESTAMP_NS"))
    val nanos = Seq(1700000000123456789L, 1700000001987654321L)
    t.append(nanos.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "ts"))

    val mj = IcebergExport.export(t, s"$loc/exported")
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mj)), "UTF-8")
    assert(metaText.contains("\"format-version\": 3"),
      "a timestamp_ns column requires Iceberg format v3")
    assert(metaText.contains("\"timestamp_ns\""))
    val got = IcebergInterop.read(spark, mj)
    assert(got.select("ts").collect().map(_.getLong(0)).sorted.toSeq == nanos.sorted,
      "nanosecond precision must survive the round trip losslessly")
  }
}
