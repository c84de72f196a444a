package graft.icelite.connector

import graft.icelite.{IceLite, IceLiteTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Offset = an IceLite snapshot id (the snapshot log IS the stream's
  * write-ahead log); json is the bare number. */
private[connector] case class IceLiteOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** One appended data file of one micro-batch. Carries everything the
  * executor-side reader needs: a serializable parquet row reader over
  * the file's PHYSICAL (write-schema) columns, and the bound projection
  * onto the stream's output schema — field-id resolution, casts and
  * initial-default fills happen here, exactly like the batch scan's
  * scanGroup, so schema-evolved lineages stream correctly. */
private[connector] case class IceLiteFilePartition(
    path: String,
    length: Long,
    readerFn: (String, Long) => Iterator[InternalRow],
    projExprs: Seq[Expression]) extends InputPartition

private[connector] object IceLiteReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[IceLiteFilePartition]
    new PartitionReader[InternalRow] {
      private val it = fp.readerFn(fp.path, fp.length)
      private val proj = UnsafeProjection.create(fp.projExprs)
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = proj(it.next()); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Structured-Streaming micro-batch source over an IceLite table —
  * Iceberg's incremental append read as a FIRST-CLASS `readStream`
  * source (no tick-driver, no foreachBatch pull):
  *
  * {{{
  *   spark.readStream.table("icelite.db.events")   // appended rows per batch
  * }}}
  *
  * Offsets are snapshot ids, so the table's own commit log is the
  * exactly-once ledger: batch (start, end] serves the data files each
  * APPEND snapshot in the range added (full file lists diff against the
  * predecessor, same rule as the changelog), `replace` points
  * (compaction / z-order / delete-rewrite) are physical no-ops and are
  * skipped, and any row-removing commit (delete / overwrite) fails
  * loudly unless `skip-delete-snapshots=true` — silently dropping a
  * delete would diverge the consumer, the same contract as Iceberg's
  * streaming read. Checkpoint restarts resume from the committed
  * snapshot id; nothing replays, nothing is skipped.
  *
  * Scale shape: planning is O(commits in the increment) driver-side
  * metadata only — a poll of a 100 TB table reads the delta's files,
  * never the table. One InputPartition per appended file; the reader is
  * Spark's own vectorized parquet reader, so the per-batch scan matches
  * the batch path's per-file cost.
  *
  * Reference: /root/reference/README.md:830–1029 (Iceberg snapshots as
  * the table's history; this is the streaming closure of that log). */
class IceLiteMicroBatchStream(
    location: String,
    readSchema: StructType,
    options: Map[String, String])
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active
  private def table: IceLiteTable = IceLite.load(spark, location)

  private val startingSnapshotId =
    options.get("starting-snapshot-id").map(_.toLong).getOrElse(0L)
  private val skipDeletes =
    options.get("skip-delete-snapshots").exists(_.toBoolean)
  /** Backlog admission control: at most this many COMMITS per micro-batch
    * (a week-old checkpoint against a hot table drains as bounded batches,
    * not one giant catch-up scan). Default unbounded. */
  private val maxSnapshotsPerTrigger =
    options.get("max-snapshots-per-trigger").map(_.toInt)

  /** Trigger.AvailableNow pins the drain target at query start: batches
    * run to exactly this snapshot, then the query stops — appends racing
    * the drain wait for the next run (the DSv2 contract). */
  private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.meta.currentSnapshotId.getOrElse(0L))

  override def initialOffset(): Offset = IceLiteOffset(startingSnapshotId)

  private def headSnapshotId: Long =
    math.max(startingSnapshotId, table.meta.currentSnapshotId.getOrElse(0L))

  override def latestOffset(): Offset =
    IceLiteOffset(availableNowEnd.fold(headSnapshotId)(e => math.max(startingSnapshotId, e)))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[IceLiteOffset].snapshotId
    val hi = latestOffset().asInstanceOf[IceLiteOffset].snapshotId
    maxSnapshotsPerTrigger match {
      case Some(n) if hi > lo =>
        // the id of the n-th snapshot past the cursor (ids are monotone
        // but not contiguous), capped at the drain target
        val ahead = table.meta.snapshots.iterator
          .map(_.id).filter(id => id > lo && id <= hi).take(n).toSeq
        IceLiteOffset(ahead.lastOption.getOrElse(hi))
      case _ => IceLiteOffset(hi)
    }
  }

  /** The TRUE head (not the AvailableNow pin) — progress reporting. */
  override def reportLatestOffset(): Offset = IceLiteOffset(headSnapshotId)

  override def deserializeOffset(json: String): Offset =
    IceLiteOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[IceLiteOffset].snapshotId
    val hi = end.asInstanceOf[IceLiteOffset].snapshotId
    if (hi <= lo) return Array.empty
    val m = table.meta
    val steps = m.snapshots.filter(s => s.id > lo && s.id <= hi).sortBy(_.id)
    // the diff base: the cursor snapshot, or — when it was expired — the
    // bootstrap (lo=0: the whole table is the first batch). Expiry drops
    // an age-ordered PREFIX of history, so a retained cursor implies every
    // later snapshot is retained too — the chain below has no hidden gaps.
    var prev: Option[graft.icelite.Snapshot] = m.snapshots.find(_.id == lo)
    require(prev.isDefined || lo == 0L,
      s"icelite stream: offset $lo is not a snapshot of $location " +
        "(expired, or a bogus starting-snapshot-id) — the gap's history " +
        "is unrecoverable; restart the query from a fresh checkpoint " +
        "(full re-read) or retain more history")
    val added = steps.flatMap { s =>
      val out = prev match {
        // bootstrap: the first served commit IS the table state then —
        // serve it whole whatever operation produced it (a fresh stream
        // on a freshly-compacted table must still see the table). Raw
        // data files are the state ONLY when no merge-on-read deletes
        // ride on them — serving a MoR table's files without its delete
        // index would resurrect deleted rows, so refuse loudly
        // (skip-delete-snapshots skips COMMITS; it cannot make this
        // batch correct).
        case None =>
          require(s.deleteFiles.isEmpty,
            s"icelite stream: bootstrap snapshot ${s.id} of $location carries " +
              "merge-on-read deletes — streaming its raw data files would " +
              "serve deleted rows; compact + expire so the stream bootstraps " +
              "from the delete-free replace point, or set " +
              "starting-snapshot-id to skip the initial content entirely")
          s.dataFiles
        case Some(p) => s.operation match {
          // O(new chunks + tails) per commit, never O(table) — the
          // manifest-structural delta (FileListing.addedSince)
          case "append" => s.files.addedSince(p.files)
          case "replace" => Seq() // compaction/z-order: no logical change
          case other =>
            require(skipDeletes,
              s"icelite stream: snapshot ${s.id} is a row-removing '$other' commit — " +
                "an append-only stream cannot represent it; set " +
                "skip-delete-snapshots=true to stream only appended rows")
            Seq()
        }
      }
      prev = Some(s)
      out
    }
    if (added.isEmpty) return Array.empty
    val conf = spark.sessionState.newHadoopConf()
    // file lengths for the split planner: small increments stat on the
    // driver (cheaper than a job), large catch-up batches fan the stat
    // RPCs across executors — a 10k-file backlog must not serialize 10k
    // driver round-trips (the same adaptive cutoff as the commit-time
    // footer harvest)
    val lens: Map[String, Long] = {
      val paths = added.map(_.path)
      def statOne(conf0: org.apache.hadoop.conf.Configuration)(p: String) = {
        val hp = new org.apache.hadoop.fs.Path(p)
        p -> hp.getFileSystem(conf0).getFileStatus(hp).getLen
      }
      if (paths.size <= 16) paths.map(statOne(conf)).toMap
      else {
        val confBc = new org.apache.spark.util.SerializableConfiguration(conf)
        spark.sparkContext.parallelize(paths, math.min(paths.size, 64))
          .map(p => statOne(confBc.value)(p)).collect().toMap
      }
    }
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val parser = spark.sessionState.sqlParser
    // one reader + bound projection per (write schema, name-mapping)
    // group — the same field-id resolution scanGroup applies: present
    // fields rename+cast, fields added after the file was written fill
    // their initial-default, evaluated ONCE here into a Literal
    val groups = added.groupBy(f => (f.schemaId, f.nameMapped))
    groups.toSeq.sortBy(_._1).flatMap { case ((sid, nameMapped), fs) =>
      val fsch = m.schema(sid)
      def stored(fl: graft.icelite.Field): String =
        if (nameMapped) fl.name else fl.physName
      val physSchema = StructType(fsch.fields.map(fl =>
        StructField(stored(fl), DataType.fromDDL(fl.sparkDdl), nullable = true)))
      val readerFn = org.apache.spark.sql.graft.SparkShims
        .parquetRowReader(spark, physSchema)
      val byId = fsch.fields.zipWithIndex.map { case (fl, i) => fl.id -> i }.toMap
      val exprs: Seq[Expression] = readSchema.fields.toSeq.map { out =>
        val fld = m.currentSchema.fieldByName(out.name)
        byId.get(fld.id) match {
          case Some(i) =>
            Cast(BoundReference(i, physSchema(i).dataType, nullable = true),
              out.dataType, tz)
          case None =>
            val v = fld.defaultSql
              .map(d => Cast(parser.parseExpression(d), out.dataType, tz).eval(null))
              .orNull
            Literal(v, out.dataType)
        }
      }
      fs.map(f =>
        IceLiteFilePartition(f.path, lens(f.path), readerFn, exprs): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = IceLiteReaderFactory
}
