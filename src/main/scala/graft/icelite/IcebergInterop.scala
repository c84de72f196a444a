package graft.icelite

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Read-only adapter for a REAL Apache Iceberg table's metadata — the
  * format this engine's IceLite mirrors (/root/reference/README.md:830–1029
  * teaches Iceberg itself; this proves the v3 IceLite metadata design is
  * genuinely Iceberg-shaped by consuming the real thing).
  *
  * Parses the Iceberg spec's on-disk artifacts directly — no Iceberg jar:
  *  - `vN.metadata.json` (table metadata: schemas, snapshots, logs) via
  *    Jackson;
  *  - the snapshot's `manifest-list` avro (one row per manifest:
  *    manifest_path, content 0=data/1=deletes, summaries) and each
  *    manifest avro (entries: status, data_file record) via avro's
  *    GenericDatumReader — avro container files EMBED their schema, so
  *    field access is by spec name and survives writer-side evolution;
  *  - data files via Spark's parquet reader, projected to the Iceberg
  *    schema by name.
  *
  * Scope (documented): data manifests with add/existing entries, snapshot
  * selection (current / VERSION AS OF), v1's inline `manifests` list and
  * v2's `manifest-list`, flat primitive schemas, partitioned tables
  * (identity + temporal transforms, spec evolution mid-history, manifest
  * partition tuples surfaced for pruning), and merge-on-read POSITION
  * deletes in both carriers — (file_path, pos) parquet and V3 deletion
  * vectors (Puffin roaring blobs via [[PuffinDv]], manifest-supplied
  * blob ranges honored). Equality-delete files (content=2 entries) still
  * raise — a read-only adapter must refuse rather than resurrect
  * MoR-deleted rows. */
object IcebergInterop {
  private val M = new ObjectMapper()

  // All metadata IO rides Hadoop FileSystem resolved from each artifact
  // path's own scheme — a real Iceberg table lives on HDFS/object stores
  // (the tutorial's own stack is Iceberg-on-MinIO, README.md:876–885), so
  // a java.io.File view would only ever read file:// fixtures.
  private def readJson(path: String, conf: Configuration): JsonNode = {
    val p = new Path(path)
    val in = FileSystem.get(p.toUri, conf).open(p)
    try M.readTree(in) finally in.close()
  }

  private def avroRows(path: String, conf: Configuration): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      ManifestCodec.openSeekable(new Path(path), conf),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }

  private def str(r: GenericRecord, field: String): String =
    Option(r.get(field)).map(_.toString).orNull

  /** Schema-safe optional field: avro's GenericRecord.get THROWS on names
    * the writer's schema never had (v1 manifest lists lack `content`,
    * unpartitioned writers omit `partition`, …). */
  private def optField(r: GenericRecord, field: String): Option[AnyRef] =
    if (r.getSchema.getField(field) != null) Option(r.get(field)) else None

  private def optInt(r: GenericRecord, field: String, dflt: Int): Int =
    optField(r, field).map(_.asInstanceOf[Number].intValue).getOrElse(dflt)
  private def long(r: GenericRecord, field: String): Long =
    r.get(field).asInstanceOf[Number].longValue

  /** Spark DDL type for an Iceberg primitive type string. */
  private def sparkType(t: String): String = t match {
    case "boolean"              => "BOOLEAN"
    case "int"                  => "INT"
    case "long"                 => "BIGINT"
    case "float"                => "FLOAT"
    case "double"               => "DOUBLE"
    case "date"                 => "DATE"
    case "timestamp"            => "TIMESTAMP_NTZ" // iceberg: without zone
    case "timestamptz"          => "TIMESTAMP"
    // V3 nanosecond timestamp: Spark tops out at µs, so the reader
    // surfaces the int64-nanos carrier — IceLite's own TIMESTAMP_NS
    // convention (README.md:1173–1179), lossless and order-preserving
    case "timestamp_ns"         => "BIGINT"
    case "string" | "uuid"      => "STRING"
    case "binary"               => "BINARY"
    case d if d.startsWith("decimal") => d.toUpperCase
    case other => sys.error(s"iceberg interop: unsupported type $other")
  }

  final case class IceSnapshot(id: Long, timestampMs: Long, operation: String,
      manifestList: Option[String], manifests: Seq[String], schemaId: Option[Int])

  /** One partition-spec field: `name` is the partition field name the
    * manifest's partition tuples use; `transform` ∈ identity / year /
    * month / day / bucket[N] / …; `sourceId` the source column's field id. */
  final case class IceSpecField(name: String, transform: String, sourceId: Int)

  /** One live data file of a snapshot, with the partition tuple its
    * manifest recorded (stringified values; empty for unpartitioned
    * files) and the spec it was written under. */
  final case class IceDataFile(path: String, specId: Int,
      partition: Map[String, String])

  final case class IceMeta(location: String, formatVersion: Int,
      currentSchemaId: Int, schemas: Map[Int, Seq[(String, String)]],
      currentSnapshotId: Option[Long], snapshots: Seq[IceSnapshot],
      specs: Map[Int, Seq[IceSpecField]])

  /** Parse an Iceberg `metadata.json` (v1 or v2/v3 shapes). */
  def loadMeta(metadataJson: String,
      conf: Configuration = new Configuration()): IceMeta = {
    val r = readJson(metadataJson, conf)
    def arr(n: JsonNode, k: String): Seq[JsonNode] =
      Option(n.get(k)).map(_.elements().asScala.toSeq).getOrElse(Seq())
    def fieldsOf(schemaNode: JsonNode): Seq[(String, String)] =
      arr(schemaNode, "fields").map(f =>
        f.get("name").asText() -> sparkType(f.get("type").asText()))
    // v2: schemas[] + current-schema-id; v1: a single "schema"
    val schemas: Map[Int, Seq[(String, String)]] =
      if (r.has("schemas"))
        arr(r, "schemas").map(s => s.get("schema-id").asInt() -> fieldsOf(s)).toMap
      else Map(0 -> fieldsOf(r.get("schema")))
    val curSchema = Option(r.get("current-schema-id")).map(_.asInt()).getOrElse(0)
    // v2: partition-specs[] with spec-id; v1: a single inline partition-spec
    def specFieldsOf(n: JsonNode): Seq[IceSpecField] =
      Option(n).map(_.elements().asScala.toSeq).getOrElse(Seq()).map(f =>
        IceSpecField(f.get("name").asText(), f.get("transform").asText(),
          f.get("source-id").asInt()))
    val specs: Map[Int, Seq[IceSpecField]] =
      if (r.has("partition-specs"))
        arr(r, "partition-specs").map(s =>
          s.get("spec-id").asInt() -> specFieldsOf(s.get("fields"))).toMap
      else if (r.has("partition-spec"))
        Map(0 -> specFieldsOf(r.get("partition-spec")))
      else Map(0 -> Seq())
    val snaps = arr(r, "snapshots").map { s =>
      IceSnapshot(
        s.get("snapshot-id").asLong(),
        Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L),
        Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
          .map(_.asText()).getOrElse("append"),
        Option(s.get("manifest-list")).map(_.asText()),
        arr(s, "manifests").map(_.asText()), // v1 inline manifest paths
        Option(s.get("schema-id")).map(_.asInt()))
    }
    IceMeta(
      Option(r.get("location")).map(_.asText()).getOrElse(""),
      Option(r.get("format-version")).map(_.asInt()).getOrElse(1),
      curSchema, schemas,
      Option(r.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L),
      snaps, specs)
  }

  /** One V3 deletion-vector reference from a delete manifest: the Puffin
    * container, the data file it deletes from, and the blob range when
    * the manifest supplies it (offset < 0 ⇒ resolve via the footer). */
  final case class DvRef(path: String, refDataFile: String,
      offset: Long, length: Long)

  /** Live file inventory of one snapshot: manifest-list (or v1 inline
    * list) → manifests → entries with status ∈ {added=1, existing=0}
    * (status=2 rows are REMOVED files and drop out). Data manifests
    * (content=0) yield [[IceDataFile]]s with their manifest-recorded
    * partition tuple; delete manifests (content=1) yield POSITION-delete
    * parquet paths (data_file.content=1, file_format=PARQUET) or V3
    * deletion-vector refs (file_format=PUFFIN with
    * referenced_data_file / content_offset / content_size_in_bytes);
    * equality-delete entries (content=2) raise — resurrecting or
    * mis-keying those rows read-only would be silent corruption. */
  private def fileInventory(meta: IceMeta, snap: IceSnapshot,
      conf: Configuration): (Seq[IceDataFile], Seq[String], Seq[DvRef]) = {
    val manifestPaths: Seq[(String, Int, Int)] = snap.manifestList match {
      case Some(ml) =>
        avroRows(ml, conf).map { r =>
          (str(r, "manifest_path"), optInt(r, "content", 0),
            optInt(r, "partition_spec_id", 0))
        }
      case None => snap.manifests.map(p => (p, 0, 0))
    }
    val dataFiles = scala.collection.mutable.ArrayBuffer[IceDataFile]()
    val posDeletes = scala.collection.mutable.ArrayBuffer[String]()
    val dvRefs = scala.collection.mutable.ArrayBuffer[DvRef]()
    manifestPaths.foreach { case (mp, manifestContent, specId) =>
      avroRows(mp, conf).foreach { e =>
        val status = optInt(e, "status", 1)
        if (status != 2) { // 2 = deleted entry: file left the table
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = optInt(df, "content", 0)
          val format = str(df, "file_format")
          content match {
            case 0 =>
              require(manifestContent == 0,
                s"iceberg interop: data file in a delete manifest: $mp")
              require(format.equalsIgnoreCase("parquet"),
                s"iceberg interop: only parquet data files (got $format)")
              val part: Map[String, String] = optField(df, "partition") match {
                case Some(p: GenericRecord) =>
                  p.getSchema.getFields.asScala.flatMap(f =>
                    Option(p.get(f.name)).map(v => f.name -> v.toString)).toMap
                case _ => Map()
              }
              dataFiles += IceDataFile(str(df, "file_path"), specId, part)
            case 1 if format.equalsIgnoreCase("puffin") =>
              // V3 deletion vector: one roaring blob inside a Puffin file
              dvRefs += DvRef(str(df, "file_path"),
                str(df, "referenced_data_file"),
                optField(df, "content_offset")
                  .map(_.asInstanceOf[Number].longValue).getOrElse(-1L),
                optField(df, "content_size_in_bytes")
                  .map(_.asInstanceOf[Number].longValue).getOrElse(-1L))
            case 1 =>
              require(format.equalsIgnoreCase("parquet"),
                s"iceberg interop: unsupported position-delete format $format")
              posDeletes += str(df, "file_path")
            case other => sys.error(
              s"iceberg interop: equality-delete files (content=$other) are " +
                "unsupported — a read-only adapter refuses rather than mis-apply them")
          }
        }
      }
    }
    (dataFiles.toSeq, posDeletes.toSeq, dvRefs.toSeq)
  }

  /** Scheme/authority-stripping normalizer, column form — delete files
    * record `file_path` as the writer spelled it while Spark's
    * `_metadata.file_path` renders a full URI; both normalize to the URI
    * path (same rule as [[IceLite.normPath]]) with codegen'd regex, no UDF. */
  private def normCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:/", "/")

  private def scan(spark: SparkSession, meta: IceMeta, snap: IceSnapshot,
      prune: Map[String, String] => Boolean): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val schema = meta.schemas(snap.schemaId.getOrElse(meta.currentSchemaId))
    val (files, posDeletes, dvRefs) = fileInventory(meta, snap, conf)
    // manifest-level partition pruning: the caller's predicate sees each
    // file's recorded partition tuple (older-spec files surface THEIR
    // tuple — a predicate must treat a missing key as "keep", the same
    // conservative contract as IceLite's own prune)
    val kept = files.filter(f => prune(f.partition))
    if (kept.isEmpty) {
      val st = org.apache.spark.sql.types.StructType(schema.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.types.DataType.fromDDL(t), nullable = true)
      })
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    }
    val base = spark.read.parquet(kept.map(_.path): _*)
    val alive =
      if (posDeletes.isEmpty && dvRefs.isEmpty) base
      else {
        // merge-on-read: anti-join on normalized (file, pos). The delete
        // side is O(deleted rows) and broadcast when small (AQE); the
        // data side never shuffles. (IceLite's OWN read path uses the
        // broadcast DeleteIndex + codegen'd probe instead; the read-only
        // adapter deliberately avoids assuming foreign writers sorted
        // their delete files the way IceLite's index relies on.)
        import spark.implicits._
        val pqDels =
          if (posDeletes.isEmpty) None
          else Some(spark.read.schema("file_path STRING, pos BIGINT")
            .parquet(posDeletes: _*))
        // V3 deletion vectors: roaring blobs expand EXECUTOR-side into
        // (file, pos) rows — manifest-supplied blob ranges seek straight
        // to their blob, rangeless refs resolve through the footer
        val confB = new org.apache.spark.util.SerializableConfiguration(conf)
        val dvDels =
          if (dvRefs.isEmpty) None
          else Some(spark
            .createDataset(dvRefs.map(r =>
              (r.path, Option(r.refDataFile).getOrElse(""), r.offset, r.length)))
            .repartition(math.max(1, dvRefs.size))
            .flatMap { case (p, ref, off, len) =>
              if (off >= 0 && len > 0 && ref.nonEmpty)
                PuffinDv.runsForBlob(new Path(p), confB.value, off, len)
                  .grouped(2).flatMap(r => (r(0) until r(0) + r(1)).iterator)
                  .map(ref -> _)
              else PuffinDv.expand(new Path(p), confB.value)
            }
            .toDF("file_path", "pos"))
        val dels = (pqDels.toSeq ++ dvDels.toSeq).reduce(_ unionByName _)
          .select(normCol(col("file_path")).as("_dfile"), col("pos").as("_dpos"))
          .distinct()
        base
          .withColumn("_ifile", normCol(col("_metadata.file_path")))
          .withColumn("_ipos", col("_metadata.row_index"))
          .join(dels, col("_ifile") === col("_dfile") && col("_ipos") === col("_dpos"),
            "left_anti")
      }
    alive.select(schema.map { case (n, t) => col(n).cast(t).as(n) }: _*)
  }

  private def snapOrEmpty(meta: IceMeta): IceSnapshot =
    meta.currentSnapshotId.flatMap(id => meta.snapshots.find(_.id == id))
      .getOrElse(IceSnapshot(0, 0, "append", None, Seq(), None))

  /** Read the table's current snapshot. */
  def read(spark: SparkSession, metadataJson: String): DataFrame =
    readPruned(spark, metadataJson, _ => true)

  /** Current snapshot with manifest-level partition pruning: `prune` sees
    * each data file's recorded partition tuple (partition field name →
    * stringified value; use `forall`-shaped predicates so files from
    * other specs stay conservatively kept). */
  def readPruned(spark: SparkSession, metadataJson: String,
      prune: Map[String, String] => Boolean): DataFrame = {
    val meta = loadMeta(metadataJson, spark.sessionState.newHadoopConf())
    scan(spark, meta, snapOrEmpty(meta), prune)
  }

  /** The file-level plan a pruned read would scan — the observable the
    * pruning specs assert on (and a migration tool's file inventory). */
  def planFiles(spark: SparkSession, metadataJson: String,
      prune: Map[String, String] => Boolean = _ => true): Seq[IceDataFile] = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = loadMeta(metadataJson, conf)
    fileInventory(meta, snapOrEmpty(meta), conf)._1.filter(f => prune(f.partition))
  }

  /** Time travel: VERSION AS OF an Iceberg snapshot id. */
  def readAsOf(spark: SparkSession, metadataJson: String, snapshotId: Long): DataFrame = {
    val meta = loadMeta(metadataJson, spark.sessionState.newHadoopConf())
    val s = meta.snapshots.find(_.id == snapshotId)
      .getOrElse(sys.error(s"no iceberg snapshot $snapshotId"))
    scan(spark, meta, s, _ => true)
  }

  /** Iceberg's encoded partition value for a temporal transform — what a
    * pruning predicate compares against: year → years since 1970, month →
    * months since 1970-01, day → days since epoch. */
  def temporalPartitionValue(transform: String, date: java.time.LocalDate): Int =
    transform match {
      case "year"  => date.getYear - 1970
      case "month" => (date.getYear - 1970) * 12 + date.getMonthValue - 1
      case "day"   => date.toEpochDay.toInt
      case other   => sys.error(s"not a temporal transform: $other")
    }

  /** The snapshot log, oldest first: (id, timestampMs, operation). */
  def snapshots(metadataJson: String,
      conf: Configuration = new Configuration()): Seq[(Long, Long, String)] =
    loadMeta(metadataJson, conf).snapshots.map(s => (s.id, s.timestampMs, s.operation))
}
