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

  test("append-only lineage exports as DELTAS; MoR lineage falls back to full per-snapshot") {
    val loc = Files.createTempDirectory("ice_export_delta").toString
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((0L, "x")).toDF("id", "tag"))
    t.append((0L until 100L).map(i => (i, s"a$i")).toDF("id", "tag"))
    val s1 = t.meta.currentSnapshotId.get
    t.append((100L until 110L).map(i => (i, s"b$i")).toDF("id", "tag"))
    val s2 = t.meta.currentSnapshotId.get
    t.append((110L until 112L).map(i => (i, s"c$i")).toDF("id", "tag"))
    val s3 = t.meta.currentSnapshotId.get

    val dest = s"$loc/exported"
    val mj = IcebergExport.export(t, dest, Seq(s1, s2, s3))
    // delta shape: snapshot 2's data dir holds ONLY the 10 appended rows
    assert(spark.read.parquet(s"$dest/data/snap-$s2").count() == 10L,
      "snapshot 2 must export only its delta, not re-rewrite the table")
    assert(spark.read.parquet(s"$dest/data/snap-$s3").count() == 2L)
    // fidelity at every exported point (snapshot 3's manifest list chains
    // the earlier manifests by reference — that's what makes the full
    // count reachable without snapshot 3 re-exporting 112 rows)
    assert(IcebergInterop.read(spark, mj).count() == 112L)
    assert(rows(IcebergInterop.readAsOf(spark, mj, s2)) == rows(t.readAsOf(s2)))
    assert(rows(IcebergInterop.readAsOf(spark, mj, s1)) == rows(t.readAsOf(s1)))
    assert(rows(IcebergInterop.read(spark, mj)) == rows(t.read()))

    // a lineage with MoR deletes cannot delta — falls back to full
    // per-snapshot export, still exact
    val loc2 = Files.createTempDirectory("ice_export_delta_mor").toString
    val u = IceLite.createFrom(spark, s"$loc2/src", Seq((0L, "x")).toDF("id", "tag"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    u.append((0L until 50L).map(i => (i, s"a$i")).toDF("id", "tag"))
    val u1 = u.meta.currentSnapshotId.get
    u.delete(col("id") < 5)
    u.append((50L until 60L).map(i => (i, s"b$i")).toDF("id", "tag"))
    val u3 = u.meta.currentSnapshotId.get
    val mj2 = IcebergExport.export(u, s"$loc2/exported", Seq(u1, u3))
    assert(spark.read.parquet(s"$loc2/exported/data/snap-$u3").count() == 55L,
      "non-append lineage must full-export each snapshot")
    assert(rows(IcebergInterop.read(spark, mj2)) == rows(u.read()))
    assert(rows(IcebergInterop.readAsOf(spark, mj2, u1)) == rows(u.readAsOf(u1)))
  }

  test("partitioned table exports spec-preserving: transforms declared, tuples typed, pruning works") {
    import java.time.LocalDate
    val loc = Files.createTempDirectory("ice_export_part").toString
    val t = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "region" -> "STRING", "d" -> "DATE"),
      partition = Seq("region" -> "identity", "d" -> "day"))
    val d1 = java.sql.Date.valueOf(LocalDate.of(2024, 1, 10))
    val d2 = java.sql.Date.valueOf(LocalDate.of(2024, 3, 5))
    t.append(Seq(
      (1L, "EU", d1), (2L, "EU", d2), (3L, "US", d1), (4L, "US", d2)
    ).toDF("id", "region", "d"))

    val mj = IcebergExport.export(t, s"$loc/exported")
    // the spec survives: transforms + source ids declared, not dropped
    val meta = IcebergInterop.loadMeta(mj)
    assert(meta.specs(0).map(f => (f.name, f.transform, f.sourceId)) ==
      Seq(("region", "identity", 2), ("d_day", "day", 3)))

    // manifest tuples carry Iceberg-ENCODED values (day = epoch days)
    val files = IcebergInterop.planFiles(spark, mj)
    assert(files.size == 4, s"one file set per partition tuple, got $files")
    val day1 = IcebergInterop.temporalPartitionValue("day", LocalDate.of(2024, 1, 10))
    assert(files.map(_.partition).toSet == Set(
      Map("region" -> "EU", "d_day" -> day1.toString),
      Map("region" -> "EU", "d_day" ->
        IcebergInterop.temporalPartitionValue("day", LocalDate.of(2024, 3, 5)).toString),
      Map("region" -> "US", "d_day" -> day1.toString),
      Map("region" -> "US", "d_day" ->
        IcebergInterop.temporalPartitionValue("day", LocalDate.of(2024, 3, 5)).toString)))

    // pruning on the exported table: identity and temporal both bite
    assert(IcebergInterop.planFiles(spark, mj,
      m => m.get("region").forall(_ == "EU")).size == 2)
    assert(IcebergInterop.planFiles(spark, mj,
      m => m.get("d_day").forall(_.toInt == day1)).size == 2)
    val pruned = IcebergInterop.readPruned(spark, mj,
      m => m.get("region").forall(_ == "EU"))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // data files stay self-contained: partition sources remain IN the
    // parquet (Spark+Iceberg's own shape), not dropped into dir names only
    val oneFile = spark.read.parquet(files.head.path)
    assert(oneFile.columns.toSet == Set("id", "region", "d"))

    // full fidelity
    assert(rows(IcebergInterop.read(spark, mj)) == rows(t.read()))

    // a bucket-spec table falls back to an honest UNPARTITIONED export
    // (xxhash64 != murmur3: declaring bucket would mis-prune real readers)
    val tb = IceLite.create(spark, s"$loc/src_bucket",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"),
      partition = Seq("id" -> "bucket[4]"))
    tb.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    val mjb = IcebergExport.export(tb, s"$loc/exported_bucket")
    assert(IcebergInterop.loadMeta(mjb).specs(0).isEmpty)
    assert(IcebergInterop.read(spark, mjb).count() == 2L)
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
