package graft.icelite

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** IceLite: a Spark-native lakehouse table (SURVEY.md §7.3, reproducing the
  * Iceberg semantics the reference teaches at
  * /root/reference/README.md:830–1192 from scratch — the environment ships
  * no Iceberg runtime jar).
  *
  * Guarantees (the tutorial's promised invariants, README.md:520–529):
  *  - snapshot isolation: readers resolve one immutable snapshot; commits
  *    are an atomic version-file swap (§ commit below)
  *  - row-level UPDATE / DELETE / MERGE (copy-on-write) + merge-on-read
  *    positional deletes (deletion vectors, README.md:1105–1121)
  *  - schema evolution without rewriting files: field-id physical columns,
  *    rename/add/add-with-default are metadata-only (README.md:976–992,
  *    1157–1166)
  *  - partition evolution: per-file spec ids; old files keep their layout
  *    (README.md:991–992)
  *  - time travel by snapshot id or timestamp + rollback (README.md:1004–1013)
  *  - maintenance: compaction, snapshot expiry, orphan removal
  *    (README.md:1022–1028)
  *
  * Scale design: all data moves through DataFrames (distributed); the
  * driver only touches metadata (file lists, row counts — KBs per commit).
  * CoW rewrites read ONLY the affected files (manifest-pruned scan), so an
  * UPDATE touching one partition of a 100 TB table rewrites one partition.
  * Merge-on-read DELETE writes positions only — no data rewrite at all.
  */
class IceLiteTable(val spark: SparkSession, val location: String) {
  import IceLite.{HINT, atomicWrite, fs}

  // ---------------------------------------------------------------- metadata

  def meta: TableMetadata = {
    val f = fs(spark, location)
    val hint = new Path(location, s"metadata/$HINT")
    val in = f.open(hint)
    val v = try scala.io.Source.fromInputStream(in).mkString.trim.toInt finally in.close()
    val mf = new Path(location, s"metadata/v$v.json")
    val min = f.open(mf)
    val js = try scala.io.Source.fromInputStream(min).mkString finally min.close()
    MetaJson.fromJson(js)
  }

  def currentVersion: Int = {
    val f = fs(spark, location)
    val in = f.open(new Path(location, s"metadata/$HINT"))
    try scala.io.Source.fromInputStream(in).mkString.trim.toInt finally in.close()
  }

  /** Atomic commit at exactly version `v`: create-if-absent (an existing
    * file means a concurrent writer claimed this version — the conflict
    * detector; do NOT silently skip it), then atomically swap the version
    * hint. Readers that loaded vN keep a fully consistent view — snapshot
    * isolation for free. */
  private def commitAt(v: Int, next: TableMetadata, note: String): Unit = {
    val f = fs(spark, location)
    val entry = MetadataLogEntry(v, System.currentTimeMillis(), note)
    val withLog = next.copy(metadataLog = next.metadataLog :+ entry)
    val target = new Path(location, s"metadata/v$v.json")
    val out = f.create(target, /* overwrite = */ false) // CREATE_NEW: conflict check
    try out.write(MetaJson.toJson(withLog).getBytes("UTF-8")) finally out.close()
    atomicWrite(f, new Path(location, s"metadata/$HINT"), v.toString)
  }

  private def commit(next: TableMetadata, note: String): Unit =
    commitAt(currentVersion + 1, next, note)

  /** Optimistic-retry commit for operations whose intent can be REBUILT on
    * top of a newer table state (append's add-files, MoR delete's
    * add-positions, pure-metadata DDL): on a version-file collision the
    * whole [load meta → rebuild → commit] cycle reruns against the
    * winner's state. If the collision persists but the hint never moves
    * across a backoff, the colliding file is an orphan from a crashed
    * writer (its hint swap never happened = it never committed) and is
    * stepped over. CoW rewrites must NOT use this — their new files are
    * derived from the old file set, so a conflict there means the rewrite
    * itself is stale and the caller must re-run the whole operation. */
  private def commitWithRetry(build: TableMetadata => (TableMetadata, String),
      retries: Int = 6): Unit = {
    var attempt = 0
    var skipOrphans = 0 // crashed-writer version files to step over
    while (true) {
      val hintBefore = currentVersion
      val (next, note) = build(meta)
      try { commitAt(hintBefore + 1 + skipOrphans, next, note); return }
      catch {
        case _: java.io.IOException if attempt < retries =>
          attempt += 1
          Thread.sleep(100L) // long enough for a live racer's hint swap to land
          if (currentVersion > hintBefore) skipOrphans = 0 // racer committed: rebase
          else skipOrphans += 1 // hint frozen: the file is an orphan
      }
    }
  }

  /** `_metadata.file_path` renders as `file:///x` while Hadoop `Path
    * .toString` renders `file:/x` — normalize both to the URI path before
    * comparing, or CoW file matching silently misses everything. */
  private def normPath(p: String): String =
    try new java.net.URI(p).getPath catch { case _: Exception => p }

  private def nextSnapshotId(m: TableMetadata): Long =
    m.snapshots.map(_.id).maxOption.getOrElse(0L) + 1

  private def newSnapshot(
      m: TableMetadata, op: String,
      dataFiles: Seq[DataFile], deleteFiles: Seq[DeleteFile]): TableMetadata = {
    val snap = Snapshot(
      nextSnapshotId(m), m.currentSnapshotId, System.currentTimeMillis(), op,
      dataFiles, deleteFiles)
    m.copy(currentSnapshotId = Some(snap.id), snapshots = m.snapshots :+ snap)
  }

  // ---------------------------------------------------------------- writing

  private def transformExpr(sf: SpecField, src: Column): Column = sf.transform match {
    case "identity" => src.cast("string")
    case "year"     => year(src).cast("string")
    case "month"    => date_format(src, "yyyy-MM")
    case "day"      => date_format(src, "yyyy-MM-dd")
    case b if b.startsWith("bucket[") =>
      val n = b.stripPrefix("bucket[").stripSuffix("]").toInt
      pmod(xxhash64(src), lit(n)).cast("string")
    case other => sys.error(s"unknown transform $other")
  }

  /** Write `df` (current-schema column names) as new data files under the
    * given spec; returns manifest entries. Data flows executor-side via a
    * normal distributed parquet write; the driver only lists the staged
    * files and reads footers for row counts. */
  private def writeFiles(df: DataFrame, m: TableMetadata, schemaId: Int, spec: PartitionSpec): Seq[DataFile] = {
    val sch = m.schema(schemaId)
    val phys = df.select(sch.fields.map(f => col(f.name).cast(f.dtype).as(f.physName)): _*)
    val stagingDir = new Path(location, s"staging-${UUID.randomUUID()}")
    val f = fs(spark, location)
    val partCols = spec.fields.map(sf => "_p_" + sf.name)
    if (spec.fields.isEmpty) {
      phys.write.parquet(stagingDir.toString)
    } else {
      val withP = spec.fields.foldLeft(phys) { (d, sf) =>
        d.withColumn("_p_" + sf.name, transformExpr(sf, col(m.schema(schemaId).byId(sf.sourceId).physName)))
      }
      // cluster rows by partition value first: without this, every input
      // partition writes a sliver of every partition value (N_input × N_values
      // tiny files — metadata and read-path poison at scale); with it, file
      // count ≈ distinct partition values.
      withP.repartition(partCols.map(col): _*)
        .write.partitionBy(partCols: _*).parquet(stagingDir.toString)
    }
    // enumerate staged parquet files; derive partition values from dir names
    val it = f.listFiles(stagingDir, true)
    val staged = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) staged += st.getPath
    }
    val dataDir = new Path(location, "data")
    f.mkdirs(dataDir)
    val conf = spark.sessionState.newHadoopConf()
    val out = staged.map { p =>
      val rel = p.toString.stripPrefix(stagingDir.toString).stripPrefix("/")
      val partVals = rel.split("/").dropRight(1).filter(_.contains("=")).map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k.stripPrefix("_p_") -> v
      }.toMap
      val dest = new Path(dataDir, s"${UUID.randomUUID()}.parquet")
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      val (rows, stats) =
        try (reader.getRecordCount, Stats.fromFooter(reader)) finally reader.close()
      if (!f.rename(p, dest)) sys.error(s"rename $p -> $dest failed")
      DataFile(dest.toString, rows, schemaId, spec.specId, partVals, stats)
    }.filter(_.rows > 0).toSeq
    f.delete(stagingDir, true)
    out
  }

  /** INSERT/append (README.md:1136–1138): new files + add-files snapshot.
    * Missing columns with defaults are filled at write; other missing
    * columns become null. */
  def append(df: DataFrame): Unit = {
    val m = meta
    val sch = m.currentSchema
    val aligned = df.select(sch.fields.map { fld =>
      if (df.columns.contains(fld.name)) col(fld.name).cast(fld.dtype).as(fld.name)
      else fld.defaultSql.map(d => expr(d).cast(fld.dtype)).getOrElse(lit(null).cast(fld.dtype)).as(fld.name)
    }: _*)
    val files = writeFiles(aligned, m, m.currentSchemaId, m.defaultSpec)
    // add-files commits rebase cleanly: the files stay valid under any
    // concurrent commit (their schemaId stays in the schema list), so a
    // conflict just replays the snapshot build on the winner's state
    commitWithRetry { cur =>
      val snap = cur.currentSnapshot
      (newSnapshot(cur, "append",
        snap.map(_.dataFiles).getOrElse(Seq()) ++ files,
        snap.map(_.deleteFiles).getOrElse(Seq())),
        s"append ${files.map(_.rows).sum} rows / ${files.size} files")
    }
  }

  // ---------------------------------------------------------------- reading

  /** Scan one schema-homogeneous group of files, projecting physical
    * field-id columns to the CURRENT schema: present → rename+cast (handles
    * rename + type widening), absent → default or null (metadata-only adds,
    * README.md:1159–1166). */
  private def scanGroup(
      m: TableMetadata, files: Seq[DataFile], fileSchemaId: Int, lineage: Boolean): DataFrame = {
    val fsch = m.schema(fileSchemaId)
    val physSchema = StructType(fsch.fields.map(fl =>
      StructField(fl.physName, DataType.fromDDL(fl.dtype), nullable = true)))
    val base = spark.read.schema(physSchema).parquet(files.map(_.path): _*)
    val cur = m.currentSchema
    val cols = cur.fields.map { fld =>
      if (fsch.hasId(fld.id)) col(fsch.byId(fld.id).physName).cast(fld.dtype).as(fld.name)
      else fld.defaultSql.map(d => expr(d).cast(fld.dtype))
        .getOrElse(lit(null).cast(fld.dtype)).as(fld.name)
    }
    val lin =
      if (lineage) Seq(
        col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_pos"))
      else Seq()
    base.select(lin ++ cols: _*)
  }

  private def scanSnapshot(m: TableMetadata, snap: Snapshot, lineage: Boolean,
      prune: Map[String, String] => Boolean,
      statFilters: Seq[Stats.StatFilter] = Seq()): DataFrame = {
    // manifest-level pruning: partition values + per-file column stats,
    // evaluated driver-side against metadata only
    val files = snap.dataFiles.filter(df =>
      prune(df.partition) && statFilters.forall(flt =>
        Stats.mayContain(df, m.schema(df.schemaId), m.currentSchema, flt)))
    if (files.isEmpty) {
      val cur = m.currentSchema
      val empty = StructType(cur.fields.map(f =>
        StructField(f.name, DataType.fromDDL(f.dtype), nullable = true)))
      val lin = if (lineage)
        StructType(Seq(StructField("_file", DataType.fromDDL("string")),
          StructField("_pos", DataType.fromDDL("bigint")))) else StructType(Seq())
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(lin ++ empty))
    }
    val needLineage = lineage || snap.deleteFiles.nonEmpty
    val grouped = files.groupBy(_.schemaId).toSeq.sortBy(_._1)
    val unioned = grouped.map { case (sid, fs0) => scanGroup(m, fs0, sid, needLineage) }
      .reduce(_ unionAll _)
    // merge-on-read: anti-join out positions recorded in delete files
    val afterDeletes =
      if (snap.deleteFiles.isEmpty) unioned
      else {
        val dels = spark.read
          .schema("file_path STRING, pos BIGINT")
          .parquet(snap.deleteFiles.map(_.path): _*)
        unioned.join(
          dels,
          unioned("_file") === dels("file_path") && unioned("_pos") === dels("pos"),
          "left_anti")
      }
    if (lineage) afterDeletes else afterDeletes.drop("_file", "_pos")
  }

  /** Read the current snapshot (optionally manifest-pruned by partition
    * values — the pruning happens on the driver against metadata, so a
    * pruned read never even lists the excluded files). */
  def read(prune: Map[String, String] => Boolean = _ => true,
      statFilters: Seq[Stats.StatFilter] = Seq()): DataFrame = {
    val m = meta
    m.currentSnapshot match {
      case Some(s) => scanSnapshot(m, s, lineage = false, prune, statFilters)
      case None    => scanSnapshot(m, Snapshot(0, None, 0, "empty", Seq(), Seq()),
        lineage = false, prune, statFilters)
    }
  }

  /** Time travel: VERSION AS OF (README.md:1007). */
  def readAsOf(snapshotId: Long): DataFrame = {
    val m = meta
    scanSnapshot(m, m.snapshot(snapshotId), lineage = false, _ => true)
  }

  /** Time travel: TIMESTAMP AS OF (README.md:1010) — latest snapshot ≤ ts. */
  def readAsOfTimestamp(ms: Long): DataFrame = {
    val m = meta
    val snap = m.snapshots.filter(_.timestampMs <= ms).maxByOption(_.id)
      .getOrElse(sys.error(s"no snapshot at or before $ms"))
    scanSnapshot(m, snap, lineage = false, _ => true)
  }

  private def readWithLineage(m: TableMetadata, snap: Snapshot): DataFrame =
    scanSnapshot(m, snap, lineage = true, _ => true)

  // ---------------------------------------------------------------- DML

  /** UPDATE … SET … WHERE (README.md:954–956), copy-on-write: only files
    * containing matching rows are rewritten; untouched files carry over. */
  def update(cond: Column, assignments: Map[String, Column]): Unit = {
    val m = meta
    val snap = m.currentSnapshot.getOrElse(return)
    val df = readWithLineage(m, snap)
    val touched = df.filter(cond).select("_file").distinct().collect()
      .map(r => normPath(r.getString(0))).toSet
    if (touched.isEmpty) return
    val (hit, keep) = snap.dataFiles.partition(f => touched.contains(normPath(f.path)))
    val hitDf = scanSnapshot(m, snap.copy(dataFiles = hit), lineage = false, _ => true)
    val rewritten = hitDf.select(m.currentSchema.fields.map { fld =>
      assignments.get(fld.name)
        .map(a => when(cond, a.cast(fld.dtype)).otherwise(col(fld.name)).as(fld.name))
        .getOrElse(col(fld.name))
    }: _*)
    val newFiles = writeFiles(rewritten, m, m.currentSchemaId, m.defaultSpec)
    commit(newSnapshot(m, "update", keep ++ newFiles, snap.deleteFiles),
      s"update rewrote ${hit.size} files")
  }

  /** DELETE WHERE — copy-on-write (README.md:959–960) or merge-on-read
    * deletion vectors (README.md:1111–1121) per
    * `write.delete.mode` (README.md:1113, M18). */
  def delete(cond: Column): Unit = {
    val m = meta
    if (m.properties.getOrElse("write.delete.mode", "copy-on-write") == "merge-on-read")
      deleteMor(m, cond)
    else deleteCow(m, cond)
  }

  private def deleteCow(m: TableMetadata, cond: Column): Unit = {
    val snap = m.currentSnapshot.getOrElse(return)
    val df = readWithLineage(m, snap)
    val touched = df.filter(cond).select("_file").distinct().collect()
      .map(r => normPath(r.getString(0))).toSet
    if (touched.isEmpty) return
    val (hit, keep) = snap.dataFiles.partition(f => touched.contains(normPath(f.path)))
    val hitDf = scanSnapshot(m, snap.copy(dataFiles = hit), lineage = false, _ => true)
    val newFiles = writeFiles(hitDf.filter(!cond), m, m.currentSchemaId, m.defaultSpec)
    commit(newSnapshot(m, "delete", keep ++ newFiles, snap.deleteFiles),
      s"delete (cow) rewrote ${hit.size} files")
  }

  /** Merge-on-read DELETE: write (file, pos) tuples — no data rewrite; the
    * read path anti-joins them out. Exactly the V3 deletion-vector promise:
    * delete cost is proportional to deleted rows, not file sizes. */
  private def deleteMor(m: TableMetadata, cond: Column): Unit = {
    val snap = m.currentSnapshot.getOrElse(return)
    val df = readWithLineage(m, snap)
    val pos = df.filter(cond).select(col("_file").as("file_path"), col("_pos").as("pos"))
    val delDir = new Path(location, "deletes")
    fs(spark, location).mkdirs(delDir)
    val out = new Path(delDir, s"${UUID.randomUUID()}")
    pos.write.parquet(out.toString)
    val f = fs(spark, location)
    val it = f.listFiles(out, true)
    val files = scala.collection.mutable.ArrayBuffer[DeleteFile]()
    val conf = spark.sessionState.newHadoopConf()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        val n = try r.getRecordCount finally r.close()
        if (n > 0) files += DeleteFile(st.getPath.toString, n)
      }
    }
    if (files.isEmpty) { f.delete(out, true); return }
    commitWithRetry { cur =>
      val cs = cur.currentSnapshot.getOrElse(sys.error("table emptied concurrently"))
      (newSnapshot(cur, "delete", cs.dataFiles, cs.deleteFiles ++ files.toSeq),
        s"delete (mor) ${files.map(_.rows).sum} positions")
    }
  }

  /** MERGE INTO … ON key WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT * (README.md:963–967). ANSI semantics: a target row
    * matching >1 source rows is an error. CoW: rewrites only files holding
    * matched rows; inserts append. */
  def merge(source: DataFrame, key: String): Unit = {
    val m = meta
    val snap = m.currentSnapshot.getOrElse(sys.error("merge into empty table"))
    val sch = m.currentSchema
    val srcAligned = source.select(sch.fields.map(f => col(f.name).cast(f.dtype).as(f.name)): _*)
    val dupCount = srcAligned.groupBy(key).count().filter(col("count") > 1).limit(1).count()
    if (dupCount > 0) sys.error(s"MERGE: duplicate source rows on key $key")
    val tgt = readWithLineage(m, snap)
    val touched = tgt.join(srcAligned.select(key), Seq(key), "left_semi")
      .select("_file").distinct().collect().map(r => normPath(r.getString(0))).toSet
    val (hit, keep) = snap.dataFiles.partition(f => touched.contains(normPath(f.path)))
    // rows of touched files, merged with their source matches
    val hitDf = scanSnapshot(m, snap.copy(dataFiles = hit), lineage = false, _ => true)
    val s = srcAligned.select(
      col(key).as("_sk") +: sch.fields.filter(_.name != key).map(f => col(f.name).as(s"_s_${f.name}")): _*)
    val mergedTouched = hitDf.join(s, hitDf(key) === s("_sk"), "left_outer")
      .select(sch.fields.map { f =>
        if (f.name == key) col(key)
        else when(col("_sk").isNotNull, col(s"_s_${f.name}")).otherwise(col(f.name)).as(f.name)
      }: _*)
    // source rows matching NO target row anywhere → inserts
    val inserts = srcAligned.join(tgt.select(key), Seq(key), "left_anti")
    val newFiles = writeFiles(mergedTouched.unionByName(inserts), m, m.currentSchemaId, m.defaultSpec)
    commit(newSnapshot(m, "merge", keep ++ newFiles, snap.deleteFiles),
      s"merge rewrote ${hit.size} files")
  }

  /** INSERT OVERWRITE: replace the whole table content in one snapshot. */
  def overwrite(df: DataFrame): Unit = {
    val m = meta
    val sch = m.currentSchema
    val aligned = df.select(sch.fields.map(f => col(f.name).cast(f.dtype).as(f.name)): _*)
    val files = writeFiles(aligned, m, m.currentSchemaId, m.defaultSpec)
    commit(newSnapshot(m, "overwrite", files, Seq()),
      s"overwrite with ${files.map(_.rows).sum} rows")
  }

  // ------------------------------------------------------------ DDL / evolution

  /** ADD COLUMN [DEFAULT] (README.md:976, 1159–1166) — metadata-only; old
    * files read the default (or null) without any rewrite. */
  def addColumn(name: String, dtype: String, defaultSql: Option[String] = None): Unit =
    commitWithRetry { m =>
      val sch = m.currentSchema
      require(!sch.fields.exists(_.name == name), s"column $name exists")
      val fid = m.lastFieldId + 1
      val next = sch.copy(
        schemaId = m.schemas.map(_.schemaId).max + 1,
        fields = sch.fields :+ Field(fid, name, dtype, defaultSql))
      (m.copy(lastFieldId = fid, currentSchemaId = next.schemaId, schemas = m.schemas :+ next),
        s"add column $name $dtype${defaultSql.map(d => s" default $d").getOrElse("")}")
    }

  /** ALTER COLUMN TYPE (widening: INT→BIGINT, FLOAT→DOUBLE, precision
    * growth) — metadata-only; old files cast up at read via the field-id
    * projection. Narrowing is rejected: it could truncate existing data. */
  def updateColumnType(name: String, newType: String): Unit = {
    val m = meta
    val sch = m.currentSchema
    val fld = sch.fieldByName(name)
    val widenings = Map(
      "INT" -> Set("BIGINT"), "SMALLINT" -> Set("INT", "BIGINT"),
      "FLOAT" -> Set("DOUBLE"))
    def base(t: String) = t.toUpperCase.takeWhile(c => c.isLetter)
    require(
      base(fld.dtype) == base(newType) ||
        widenings.getOrElse(base(fld.dtype), Set()).contains(base(newType)),
      s"cannot narrow ${fld.dtype} to $newType")
    val next = sch.copy(
      schemaId = m.schemas.map(_.schemaId).max + 1,
      fields = sch.fields.map(f => if (f.id == fld.id) f.copy(dtype = newType) else f))
    commit(m.copy(currentSchemaId = next.schemaId, schemas = m.schemas :+ next),
      s"widen $name ${fld.dtype} -> $newType")
  }

  /** RENAME COLUMN (README.md:979) — metadata-only via field ids. */
  def renameColumn(from: String, to: String): Unit = {
    val m = meta
    val sch = m.currentSchema
    val fld = sch.fieldByName(from)
    val next = sch.copy(
      schemaId = m.schemas.map(_.schemaId).max + 1,
      fields = sch.fields.map(f => if (f.id == fld.id) f.copy(name = to) else f))
    commit(m.copy(currentSchemaId = next.schemaId, schemas = m.schemas :+ next),
      s"rename $from -> $to")
  }

  /** ALTER TABLE … ADD PARTITION FIELD (README.md:991–992): future writes
    * use the new spec; existing files keep theirs (per-file specId). */
  def setPartitionSpec(fields: Seq[(String, String)]): Unit = {
    val m = meta
    val sch = m.currentSchema
    val specId = m.specs.map(_.specId).max + 1
    val sfs = fields.map { case (srcName, transform) =>
      val f = sch.fieldByName(srcName)
      SpecField(f.id, transform, s"${srcName}_$transform")
    }
    commit(m.copy(defaultSpecId = specId, specs = m.specs :+ PartitionSpec(specId, sfs)),
      s"set partition spec ${fields.mkString(",")}")
  }

  /** SET TBLPROPERTIES (README.md:1113–1114). */
  def setProperties(props: Map[String, String]): Unit = {
    val m = meta
    commit(m.copy(properties = m.properties ++ props), s"set properties ${props.keys.mkString(",")}")
  }

  // ------------------------------------------------------------ maintenance

  /** rewrite_data_files (README.md:1022): many small files → `target`
    * files. Logical content unchanged; MoR deletes are materialized. */
  def compact(target: Int): Unit = {
    val m = meta
    val snap = m.currentSnapshot.getOrElse(return)
    val df = scanSnapshot(m, snap, lineage = false, _ => true).repartition(target)
    val newFiles = writeFiles(df, m, m.currentSchemaId, m.defaultSpec)
    commit(newSnapshot(m, "replace", newFiles, Seq()),
      s"compact ${snap.dataFiles.size} -> ${newFiles.size} files")
  }

  /** rollback_to_snapshot (README.md:1013): pointer swap via a NEW snapshot
    * whose file set is the target's — history preserved. */
  def rollbackTo(snapshotId: Long): Unit = {
    val m = meta
    val tgt = m.snapshot(snapshotId)
    commit(newSnapshot(m, "rollback", tgt.dataFiles, tgt.deleteFiles),
      s"rollback to $snapshotId")
  }

  /** expire_snapshots(older_than) (README.md:1025): drop old snapshots
    * (always keeping the current one) and physically delete files no live
    * snapshot references. */
  def expireSnapshots(olderThanMs: Long): Unit = {
    val m = meta
    val curId = m.currentSnapshotId.getOrElse(return)
    val (dead, live) = m.snapshots.partition(s => s.timestampMs < olderThanMs && s.id != curId)
    if (dead.isEmpty) return
    val liveFiles = live.flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path))
      .map(normPath).toSet
    val f = fs(spark, location)
    dead.flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path))
      .filterNot(p => liveFiles.contains(normPath(p))).distinct
      .foreach(p => f.delete(new Path(p), false))
    commit(m.copy(snapshots = live), s"expire ${dead.size} snapshots")
  }

  /** remove_orphan_files (README.md:1028): FS listing ∖ referenced files. */
  def removeOrphanFiles(): Seq[String] = {
    val m = meta
    val referenced = m.snapshots
      .flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path))
      .map(normPath).toSet
    val f = fs(spark, location)
    val removed = scala.collection.mutable.ArrayBuffer[String]()
    for (dir <- Seq("data", "deletes")) {
      val d = new Path(location, dir)
      if (f.exists(d)) {
        val it = f.listFiles(d, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && !referenced.contains(normPath(st.getPath.toString))) {
            f.delete(st.getPath, false)
            removed += st.getPath.toString
          }
        }
      }
    }
    removed.toSeq
  }

  // ------------------------------------------------------------ metadata tables

  /** `SELECT * FROM t.snapshots` (README.md:1004). */
  def snapshotsDf: DataFrame = {
    import spark.implicits._
    meta.snapshots.map(s => (
      s.id, s.parentId.getOrElse(-1L), new java.sql.Timestamp(s.timestampMs), s.operation,
      s.dataFiles.size.toLong, s.deleteFiles.size.toLong, s.totalRows))
      .toDF("snapshot_id", "parent_id", "committed_at", "operation",
        "data_files", "delete_files", "total_rows")
  }

  /** `SELECT * FROM t.history` (README.md:982) — the metadata/DDL log. */
  def historyDf: DataFrame = {
    import spark.implicits._
    meta.metadataLog.map(e => (e.version.toLong, new java.sql.Timestamp(e.timestampMs), e.note))
      .toDF("version", "made_at", "note")
  }

  /** `SELECT * FROM t.partitions` (README.md:995). */
  def partitionsDf: DataFrame = {
    import spark.implicits._
    val cur = meta.currentSnapshot.map(_.dataFiles).getOrElse(Seq())
    cur.groupBy(f => (f.specId, f.partition.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")))
      .map { case ((specId, part), fs0) =>
        (if (part.isEmpty) "<unpartitioned>" else part, specId, fs0.size.toLong, fs0.map(_.rows).sum)
      }.toSeq.sortBy(r => (r._2, r._1))
      .toDF("partition", "spec_id", "file_count", "row_count")
  }

  /** `SELECT * FROM t.files` — current data file manifest. */
  def filesDf: DataFrame = {
    import spark.implicits._
    meta.currentSnapshot.map(_.dataFiles).getOrElse(Seq())
      .map(f => (f.path, f.rows, f.schemaId, f.specId,
        f.partition.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")))
      .toDF("path", "rows", "schema_id", "spec_id", "partition")
  }
}

object IceLite {
  private[icelite] val HINT = "version-hint.text"

  private[icelite] def fs(spark: SparkSession, location: String): FileSystem =
    new Path(location).getFileSystem(spark.sessionState.newHadoopConf())

  /** tmp-write + rename — the atomic pointer swap that gives ACID commits
    * (the reference's catalog-pointer-swap, README.md:511–529). */
  private[icelite] def atomicWrite(f: FileSystem, target: Path, content: String): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target)) sys.error(s"atomic rename to $target failed")
  }

  /** CREATE TABLE (README.md:944–951). `schema` = (name, sparkDdlType).
    * `partition` = (sourceColumn, transform). */
  def create(
      spark: SparkSession, location: String,
      schema: Seq[(String, String)],
      partition: Seq[(String, String)] = Seq(),
      properties: Map[String, String] = Map()): IceLiteTable = {
    val f = fs(spark, location)
    val metaDir = new Path(location, "metadata")
    require(!f.exists(new Path(metaDir, HINT)), s"table exists at $location")
    f.mkdirs(metaDir)
    val fields = schema.zipWithIndex.map { case ((n, t), i) => Field(i + 1, n, t, None) }
    val sch = TableSchema(0, fields)
    val sfs = partition.map { case (srcName, transform) =>
      val fld = sch.fieldByName(srcName)
      SpecField(fld.id, transform, s"${srcName}_$transform")
    }
    val m = TableMetadata(
      location = location,
      lastFieldId = fields.size,
      currentSchemaId = 0,
      schemas = Seq(sch),
      defaultSpecId = 0,
      specs = Seq(PartitionSpec(0, sfs)),
      properties = properties,
      currentSnapshotId = None,
      snapshots = Seq(),
      metadataLog = Seq(MetadataLogEntry(1, System.currentTimeMillis(), "create table")))
    val target = new Path(metaDir, "v1.json")
    val out = f.create(target, false)
    try out.write(MetaJson.toJson(m).getBytes("UTF-8")) finally out.close()
    atomicWrite(f, new Path(metaDir, HINT), "1")
    new IceLiteTable(spark, location)
  }

  /** CREATE TABLE AS the schema of an existing DataFrame. */
  def createFrom(
      spark: SparkSession, location: String, like: DataFrame,
      partition: Seq[(String, String)] = Seq(),
      properties: Map[String, String] = Map()): IceLiteTable =
    create(spark, location,
      like.schema.fields.toSeq.map(f => f.name -> f.dataType.sql),
      partition, properties)

  def load(spark: SparkSession, location: String): IceLiteTable =
    new IceLiteTable(spark, location)
}
