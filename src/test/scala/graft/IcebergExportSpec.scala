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

    // exported parquet carries PARQUET FIELD IDS — real Iceberg readers
    // resolve by id, not name, so the files must declare their ids
    val aFile = IcebergInterop.planFiles(spark, mj).head.path
    val conf = spark.sessionState.newHadoopConf()
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(aFile), conf))
    val ids =
      try {
        import scala.jdk.CollectionConverters._
        rdr.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(f => f.getName -> Option(f.getId).map(_.intValue())).toMap
      } finally rdr.close()
    assert(ids == Map("id" -> Some(1), "v" -> Some(2), "name" -> Some(3),
      // V3 row lineage: materialized columns under the spec's RESERVED ids
      IceLite.RowIdCol -> Some(IcebergExport.RowIdFieldId.toInt),
      IceLite.LastUpdatedCol -> Some(IcebergExport.LastUpdatedFieldId.toInt)),
      s"exported parquet must carry the schema's field ids, got $ids")
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

  test("delta export chains through metadata-only schema changes (rename + add-default)") {
    val loc = Files.createTempDirectory("ice_export_delta_ddl").toString
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((0L, "x")).toDF("id", "tag"))
    t.append((0L until 100L).map(i => (i, s"a$i")).toDF("id", "tag"))
    val s1 = t.meta.currentSnapshotId.get
    t.renameColumn("tag", "label") // metadata-only, no new snapshot
    t.append((100L until 110L).map(i => (i, s"b$i")).toDF("id", "label"))
    val s2 = t.meta.currentSnapshotId.get
    t.addColumn("src", "STRING", defaultSql = Some("'bulk'")) // metadata-only
    t.append(Seq((110L, "c0", "live"), (111L, "c1", "live"))
      .toDF("id", "label", "src"))
    val s3 = t.meta.currentSnapshotId.get

    val dest = s"$loc/exported"
    val mj = IcebergExport.export(t, dest, Seq(s1, s2, s3))
    // STILL a delta: later snapshots move only their appended rows even
    // though a rename and a defaulted add happened mid-range
    assert(spark.read.parquet(s"$dest/data/snap-$s2").count() == 10L,
      "rename in range must not force a full re-export")
    assert(spark.read.parquet(s"$dest/data/snap-$s3").count() == 2L,
      "add-default in range must not force a full re-export")

    // point-in-time fidelity INCLUDING each point's own schema
    val asOf1 = IcebergInterop.readAsOf(spark, mj, s1)
    assert(asOf1.columns.toSeq == Seq("id", "tag"),
      "VERSION AS OF the pre-rename snapshot shows the old name")
    assert(rows(asOf1) == rows(t.readAsOf(s1)))
    val asOf2 = IcebergInterop.readAsOf(spark, mj, s2)
    assert(asOf2.columns.toSeq == Seq("id", "label"),
      "the renamed column resolves by field id over pre-rename files")
    assert(rows(asOf2) == rows(t.readAsOf(s2)))

    // current read: old chained files fill `src` through V3 initial-default
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mj)), "UTF-8")
    assert(metaText.contains("\"initial-default\": \"bulk\""))
    assert(metaText.contains("\"format-version\": 3"))
    val cur = IcebergInterop.read(spark, mj)
    assert(cur.columns.toSeq == Seq("id", "label", "src"))
    assert(cur.filter(col("id") < 110L && col("src") === "bulk").count() == 110L,
      "files predating the defaulted column must fill its initial-default")
    assert(cur.filter(col("src") === "live").count() == 2L,
      "files carrying the column keep their stored values")
    assert(rows(cur) == rows(t.read()))

    // a DROPPED column in range still falls back to full re-export
    val u = IceLite.createFrom(spark, s"$loc/src2", Seq((0L, "x", 1L)).toDF("id", "tag", "v"))
    u.append((0L until 20L).map(i => (i, s"a$i", i)).toDF("id", "tag", "v"))
    val u1 = u.meta.currentSnapshotId.get
    u.dropColumn("v")
    u.append((20L until 25L).map(i => (i, s"b$i")).toDF("id", "tag"))
    val u2 = u.meta.currentSnapshotId.get
    val mj2 = IcebergExport.export(u, s"$loc/exported2", Seq(u1, u2))
    assert(spark.read.parquet(s"$loc/exported2/data/snap-$u2").count() == 25L,
      "drop-column lineage full-exports each snapshot")
    assert(rows(IcebergInterop.readAsOf(spark, mj2, u1)) == rows(u.readAsOf(u1)))
    assert(rows(IcebergInterop.read(spark, mj2)) == rows(u.read()))
  }

  test("DECIMAL initial-default exports as a scale-true JSON string (V3 single-value)") {
    val loc = Files.createTempDirectory("ice_export_dec_default").toString
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((0L, "x")).toDF("id", "tag"))
    t.append((0L until 40L).map(i => (i, s"a$i")).toDF("id", "tag"))
    val s1 = t.meta.currentSnapshotId.get
    // metadata-only add with a default whose literal scale (1) is NOT the
    // declared scale (2): the single-value spec wants the declared scale
    t.addColumn("price", "DECIMAL(10,2)", defaultSql = Some("4.5"))
    t.append(Seq((40L, "b0", "7.25"), (41L, "b1", "7.75")).toDF("id", "tag", "price")
      .select(col("id"), col("tag"), col("price").cast("decimal(10,2)")))
    val s2 = t.meta.currentSnapshotId.get

    val dest = s"$loc/exported"
    val mj = IcebergExport.export(t, dest, Seq(s1, s2))
    // still a delta: the defaulted add must not force a full re-export
    assert(spark.read.parquet(s"$dest/data/snap-$s2").count() == 2L)
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mj)), "UTF-8")
    // Iceberg single-value JSON: DECIMAL is a STRING, rescaled to the
    // field's declared scale — never a bare number a reader might float-parse
    assert(metaText.contains("\"initial-default\": \"4.50\""),
      s"DECIMAL default must serialize as a scale-true JSON string; got: " +
        metaText.linesIterator.filter(_.contains("initial-default")).mkString)
    assert(metaText.contains("\"format-version\": 3"))

    val cur = IcebergInterop.read(spark, mj)
    assert(cur.schema("price").dataType.sql == "DECIMAL(10,2)")
    assert(cur.filter(col("id") < 40L)
      .select("price").distinct().collect().map(_.getDecimal(0).toPlainString)
      .toSeq == Seq("4.50"),
      "chained pre-default files must fill the rescaled decimal default")
    assert(rows(cur) == rows(t.read()))
  }

  test("small-magnitude DECIMAL default emits a plain string, never scientific notation") {
    val loc = Files.createTempDirectory("ice_export_dec_sci").toString
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((0L, "x")).toDF("id", "tag"))
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "tag"))
    val s1 = t.meta.currentSnapshotId.get
    // BigDecimal("0.00000001").toString is "1E-8" (scientific below 1e-7);
    // the Iceberg single-value spec wants a plain decimal string
    t.addColumn("eps", "DECIMAL(12,8)", defaultSql = Some("0.00000001"))
    t.append(Seq((10L, "b0", "0.50000000")).toDF("id", "tag", "eps")
      .select(col("id"), col("tag"), col("eps").cast("decimal(12,8)")))
    val s2 = t.meta.currentSnapshotId.get
    val mj = IcebergExport.export(t, s"$loc/exported", Seq(s1, s2))
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mj)), "UTF-8")
    assert(metaText.contains("\"initial-default\": \"0.00000001\""),
      s"small decimal default must stay plain; got: " +
        metaText.linesIterator.filter(_.contains("initial-default")).mkString)
    assert(!metaText.contains("1E-8"))
    assert(rows(IcebergInterop.read(spark, mj)) == rows(t.read()))
  }

  test("export against a pinned metadata ignores commits landing after the pin") {
    val loc = Files.createTempDirectory("ice_export_pinned").toString
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((0L, "x")).toDF("id", "tag"))
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "tag"))
    // pin one (version, metadata); a racing commit then moves the table on
    val (_, pm) = t.versionedMeta
    t.append(Seq((10L, "late"), (11L, "later")).toDF("id", "tag"))
    val mj = IcebergExport.export(t, s"$loc/exported", pinned = Some(pm))
    // the export must describe the PINNED state — the REST cache keys
    // exports by table version, so leaked newer rows would be served as
    // the older version forever
    assert(IcebergInterop.read(spark, mj).count() == 10L,
      "a commit landing after the pin leaked into the export")
    assert(rows(IcebergInterop.read(spark, mj)) ==
      rows(t.readAsOf(pm.currentSnapshotId.get)))
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
    // parquet (Spark+Iceberg's own shape), not dropped into dir names
    // only — plus the V3 materialized row-lineage columns
    val oneFile = spark.read.parquet(files.head.path)
    assert(oneFile.columns.toSet ==
      Set("id", "region", "d", IceLite.RowIdCol, IceLite.LastUpdatedCol))

    // full fidelity
    assert(rows(IcebergInterop.read(spark, mj)) == rows(t.read()))

  }

  test("bucket[N] exports spec-preserving through the Iceberg murmur3 hash") {
    val loc = Files.createTempDirectory("ice_export_bucket").toString
    // IceLite lays this table out by xxhash64 buckets; the export must
    // REASSIGN rows to Iceberg's murmur3 buckets (spec-vector-validated
    // in IcebergTransformsSpec) or real readers prune wrong rows
    val t = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"),
      partition = Seq("id" -> "bucket[4]"))
    val ids = 0L until 40L
    t.append(ids.map(i => (i, i * 10)).toDF("id", "v"))

    val mj = IcebergExport.export(t, s"$loc/exported")
    val meta = IcebergInterop.loadMeta(mj)
    assert(meta.specs(0).map(f => (f.name, f.transform, f.sourceId)) ==
      Seq(("id_bucket", "bucket[4]", 1)))

    // manifest tuples carry exactly the murmur3 bucket of each file's ids
    val files = IcebergInterop.planFiles(spark, mj)
    assert(files.map(_.partition.get("id_bucket")).distinct.size == 4)
    files.foreach { f =>
      val b = f.partition("id_bucket").toInt
      val got = spark.read.parquet(f.path).select("id").as[Long].collect()
      assert(got.nonEmpty && got.forall(IcebergTransforms.bucketLong(_, 4) == b),
        s"file ${f.path} holds ids outside its declared bucket $b")
    }
    // a real reader's pruning: bucket(lit) selects exactly the matching rows
    val probe = 17L
    val pb = IcebergTransforms.bucketLong(probe, 4)
    val pruned = IcebergInterop.readPruned(spark, mj,
      m => m.get("id_bucket").forall(_.toInt == pb))
    val expect = ids.filter(IcebergTransforms.bucketLong(_, 4) == pb)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == expect,
      "bucket pruning must return the full bucket and nothing else")
    assert(rows(IcebergInterop.read(spark, mj)) == rows(t.read()))

    // bucket over a source the spec can't hash (TIMESTAMP_NS nanos
    // carrier) still falls back to an honest unpartitioned export
    val tn = IceLite.create(spark, s"$loc/src_ns",
      Seq("ts" -> "TIMESTAMP_NS", "v" -> "BIGINT"),
      partition = Seq("ts" -> "bucket[4]"))
    tn.append(Seq((1700000000123456789L, 1L)).toDF("ts", "v"))
    val mjn = IcebergExport.export(tn, s"$loc/exported_ns")
    assert(IcebergInterop.loadMeta(mjn).specs(0).isEmpty)
    assert(IcebergInterop.read(spark, mjn).count() == 1L)
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

  test("VARIANT crosses the interop boundary: export + independent re-read, path access intact") {
    val loc = Files.createTempDirectory("ice_export_variant").toString
    val t = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "payload" -> "VARIANT"))
    t.append(spark.sql(
      """SELECT id, parse_json(concat('{"k": ', id * 7, ', "tag": "t', id, '"}')) AS payload
        |FROM range(0, 50) AS r(id)""".stripMargin))
    // a MoR delete on top: the export must materialize it under variant too
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.delete(expr("variant_get(payload, '$.k', 'long') > 300"))

    val mj = IcebergExport.export(t, s"$loc/exported")
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mj)), "UTF-8")
    assert(metaText.contains("\"format-version\": 3"),
      "a variant column requires Iceberg format v3")
    assert(metaText.contains("\"type\": \"variant\""))

    val got = IcebergInterop.read(spark, mj)
    assert(got.schema("payload").dataType.typeName == "variant",
      s"the foreign read must surface a first-class VARIANT, got ${got.schema}")
    def extract(df: DataFrame): Seq[(Long, Long, String)] = df.select(
      col("id"),
      expr("variant_get(payload, '$.k', 'long')").as("k"),
      expr("variant_get(payload, '$.tag', 'string')").as("tag")
    ).as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val want = extract(t.read())
    assert(want.size == 43 && want.forall(_._2 <= 300), "precondition: delete bit")
    assert(extract(got) == want,
      "variant_get over the exported table must equal the pre-export table")
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

  test("write-default exports, adopt honors it, and it re-exports") {
    val loc = Files.createTempDirectory("ice_export_wdef").toString
    def txt(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val t = IceLite.createFrom(spark, s"$loc/src", Seq((1L, "a")).toDF("id", "v"))
    t.append((0L until 10L).map(i => (i, s"r$i")).toDF("id", "v"))
    t.addColumn("ch", "STRING", Some("'web'"))
    t.setWriteDefault("ch", "'store'")
    // native semantics first: omitted column fills the WRITE default;
    // pre-add rows keep reading the immutable initial default
    t.append(Seq((50L, "z")).toDF("id", "v"))
    val natives = t.read().select("id", "ch").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(natives(0L) == "web" && natives(50L) == "store")
    val mj = IcebergExport.export(t, s"$loc/ex")
    val m1 = txt(mj)
    assert(m1.contains("\"write-default\": \"store\""),
      s"write-default must export, got $m1")
    assert(m1.contains("\"format-version\": 3"),
      "write-default is a V3 feature")
    assert(IcebergInterop.loadMeta(mj).schemas.values.flatten
      .exists(f => f.name == "ch" && f.writeDefault.contains("'store'")))
    // adopt honors the foreign write-default: a native append that omits
    // the column materializes the foreign writer's declared fill
    val a = IceLite.adopt(spark, mj, s"$loc/ad")
    a.append(Seq((100L, "q")).toDF("id", "v"))
    val adopted = a.read().select("id", "ch").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(adopted(100L) == "store",
      "adopted tables must honor the foreign write-default")
    assert(adopted(0L) == "web",
      "pre-add rows keep the materialized initial fill across the boundary")
    // and it crosses again on re-export
    assert(txt(IcebergExport.export(a, s"$loc/re"))
      .contains("\"write-default\": \"store\""))
  }

  test("write defaults are restricted to foldable literals") {
    // the fill resolves against each incoming DataFrame at write time and
    // serializes through writeDefaultJson on export — a column reference
    // would silently read source data, a now() would fill differently per
    // write and drop at the export boundary; both must be rejected at DDL
    val loc = Files.createTempDirectory("ice_wdef_lit").toString
    val t = IceLite.createFrom(spark, s"$loc/t", Seq((1L, "a")).toDF("id", "v"))
    t.addColumn("ch", "STRING", Some("'web'"))
    t.addColumn("n", "BIGINT")
    t.setWriteDefault("ch", "'store'")            // plain literal: ok
    t.setWriteDefault("n", "-4")                  // negated literal: ok
    t.setWriteDefault("ch", "CAST('x' AS STRING)") // cast literal: ok
    t.setWriteDefault("ch", "null")               // DROP DEFAULT: ok
    for (bad <- Seq("id", "now()", "concat('a', 'b')", "id + 1"))
      assert(intercept[IllegalArgumentException](t.setWriteDefault("ch", bad))
        .getMessage.contains("must be a literal"), s"'$bad' must be rejected")
    t.append(Seq((9L, "z")).toDF("id", "v"))
    val got = t.read().filter(col("id") === 9L).select("ch", "n").collect().head
    assert(got.getString(0) == null && got.getLong(1) == -4L,
      "the accepted literals fill as declared (ch dropped to null default)")
  }

  test("refs created BETWEEN chained exports travel through the delta chain") {
    // the chained export splices refs from base.snapIds ++ new ids — a
    // branch created AFTER the base export at a base snapshot, and a tag
    // at the new head, must both surface in the chained metadata and
    // survive adoption
    val loc = Files.createTempDirectory("ice_chain_refs").toString
    val t = IceLite.create(spark, s"$loc/src",
      Seq("id" -> "BIGINT", "v" -> "STRING"))
    t.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val s1 = t.meta.currentSnapshotId.get
    val mj1 = IcebergExport.export(t, s"$loc/exp1")
    // BETWEEN the exports: a branch pinned at the already-exported base
    // snapshot, then new history and a tag at its head
    t.createBranch("audit", Some(s1))
    t.append((10L until 15L).map(i => (i, s"b$i")).toDF("id", "v"))
    val s2 = t.meta.currentSnapshotId.get
    t.createTag("release", s2)
    val mj2 = IcebergExport.exportChained(t, s"$loc/exp2", mj1)
      .getOrElse(fail("an append-only continuation must chain"))
    val conf = spark.sessionState.newHadoopConf()
    val refs = IcebergInterop.loadMeta(mj2, conf).refs
    assert(refs.get("audit").map(r => (r.snapshotId, r.refType))
        .contains((s1, "branch")),
      s"a branch created between exports must travel, got $refs")
    assert(refs.get("release").map(r => (r.snapshotId, r.refType))
        .contains((s2, "tag")), s"the head tag must travel, got $refs")
    // …and the chained metadata adopts with both refs live
    val a = IceLite.adopt(spark, mj2, s"$loc/adopted")
    assert(a.meta.refs.keySet == Set("audit", "release"),
      s"adopted refs: ${a.meta.refs}")
    assert(a.readRef("audit").count() == 10L,
      "the between-exports branch serves its pinned content")
    assert(a.readRef("release").count() == 15L)

    // a METADATA-ONLY chain (rename — same head) keeps carrying them
    t.renameColumn("v", "label")
    val mj3 = IcebergExport.exportChained(t, s"$loc/exp3", mj2)
      .getOrElse(fail("a metadata-only bump must chain"))
    val refs3 = IcebergInterop.loadMeta(mj3, conf).refs
    assert(refs3.contains("audit") && refs3.contains("release"),
      s"refs must survive a metadata-only chain, got $refs3")
  }

  test("sort orders cross the export/adopt boundary and re-export identically") {
    val loc = Files.createTempDirectory("ice_export_sort").toString
    def txt(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val t = IceLite.createFrom(spark, s"$loc/src",
      Seq((1L, "a")).toDF("id", "v"))
    t.setSortOrder(Seq("id"))
    t.append((0L until 40L).map(i => (i, s"r$i")).toDF("id", "v"))
    val mj = IcebergExport.export(t, s"$loc/exported")
    val m1 = txt(mj)
    assert(m1.contains("\"default-sort-order-id\": 1"),
      "a declared sort order must export as the default sort order")
    assert(m1.contains("\"order-id\": 1") && m1.contains("\"transform\": \"identity\"")
      && m1.contains("\"source-id\": 1") && m1.contains("\"direction\": \"asc\""),
      s"the real sort order fields must be emitted, got: $m1")
    // interop parses it; adopt declares it; re-export emits the same order
    assert(IcebergInterop.loadMeta(mj).sortOrder ==
      Seq(IcebergInterop.IceSortField(1, "identity", "asc", "nulls-first")))
    val a = IceLite.adopt(spark, mj, s"$loc/adopted")
    assert(a.meta.properties.get("write.sort-order").contains("id"),
      "the foreign sort order must survive adoption as the declared order")
    val m2 = txt(IcebergExport.export(a, s"$loc/re_exported"))
    assert(m2.contains("\"default-sort-order-id\": 1") &&
      m2.contains("\"source-id\": 1"),
      "an adopted sorted table re-exports the same order")
    assert(rows(a.read()) == rows(t.read()))

    // FULL-fidelity order: transform + direction + null order round-trip
    // unchanged (truncate[4](code) desc nulls-last, id) — the shape a
    // foreign table sorted desc used to lose its hint on
    val tf = IceLite.create(spark, s"$loc/fsrc",
      Seq("id" -> "BIGINT", "code" -> "STRING"))
    tf.setSortOrder(Seq("truncate[4](code) desc nulls-last", "id"))
    tf.append((0L until 40L).map(i =>
      (i, if (i % 7 == 0) null else s"c${i % 5}%04d-$i")).toDF("id", "code"))
    assert(rows(tf.read()).size == 40, "the transform-sorted write stays exact")
    val mjf = IcebergExport.export(tf, s"$loc/fexp")
    val mf = txt(mjf)
    assert(mf.contains("\"default-sort-order-id\": 1") &&
      mf.contains("\"transform\": \"truncate[4]\"") &&
      mf.contains("\"direction\": \"desc\"") &&
      mf.contains("\"null-order\": \"nulls-last\""),
      s"the full sort fidelity must export, got: $mf")
    assert(IcebergInterop.loadMeta(mjf).sortOrder == Seq(
      IcebergInterop.IceSortField(2, "truncate[4]", "desc", "nulls-last"),
      IcebergInterop.IceSortField(1, "identity", "asc", "nulls-first")))
    val af = IceLite.adopt(spark, mjf, s"$loc/fadopt")
    assert(af.meta.properties.get("write.sort-order")
      .contains("truncate[4](code) desc nulls-last,id"),
      s"adopt must keep the full order, got ${af.meta.properties.get("write.sort-order")}")
    af.append(Seq((100L, "zz")).toDF("id", "code")) // the adopted order applies
    val mf2 = txt(IcebergExport.export(af, s"$loc/freexp"))
    assert(mf2.contains("\"transform\": \"truncate[4]\"") &&
      mf2.contains("\"direction\": \"desc\"") &&
      mf2.contains("\"null-order\": \"nulls-last\""),
      "the adopted order re-exports unchanged")

    // murmur3 bucket order: mbucket[8] exports as the spec's bucket[8]
    // and adopts back onto mbucket[8]; a NATIVE xxhash bucket[4] order
    // has no honest spec transform, so the whole order drops on export
    val tb = IceLite.create(spark, s"$loc/bsrc", Seq("id" -> "BIGINT"))
    tb.setSortOrder(Seq("mbucket[8](id)"))
    tb.append((0L until 20L).map(Tuple1(_)).toDF("id"))
    val mjb = IcebergExport.export(tb, s"$loc/bexp")
    assert(txt(mjb).contains("\"transform\": \"bucket[8]\""))
    val ab = IceLite.adopt(spark, mjb, s"$loc/badopt")
    assert(ab.meta.properties.get("write.sort-order").contains("mbucket[8](id)"))
    val tx = IceLite.create(spark, s"$loc/xsrc", Seq("id" -> "BIGINT"))
    tx.setSortOrder(Seq("bucket[4](id)"))
    tx.append((0L until 20L).map(Tuple1(_)).toDF("id"))
    assert(txt(IcebergExport.export(tx, s"$loc/xexp"))
      .contains("\"default-sort-order-id\": 0"),
      "an xxhash-bucket order must drop whole rather than lie")

    // z-order: the spec's sort orders can't express a curve — the hint
    // travels as a table property and survives the round trip
    val tz = IceLite.createFrom(spark, s"$loc/zsrc",
      Seq((1L, 1L, "a")).toDF("x", "y", "v"))
    tz.append((0L until 64L).map(i => (i, 63 - i, s"r$i")).toDF("x", "y", "v"))
    tz.compactZOrder(2, "x", "y")
    assert(tz.meta.properties.get("write.zorder-by").contains("x,y"),
      "z-order stamps its clustering hint as a property")
    val mjz = IcebergExport.export(tz, s"$loc/zexported")
    assert(txt(mjz).contains("\"write.zorder-by\": \"x,y\""),
      "the z-order hint must export as a table property")
    val az = IceLite.adopt(spark, mjz, s"$loc/zadopted")
    assert(az.meta.properties.get("write.zorder-by").contains("x,y"))
    assert(txt(IcebergExport.export(az, s"$loc/zre")).contains(
      "\"write.zorder-by\": \"x,y\""))
    assert(rows(az.read()) == rows(tz.read()))
  }
}
