package graft.icelite.connector

import java.util

import graft.icelite.IceLiteTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** DSv2 Table over an IceLite table, reading/writing through the V1
  * fallback bridges (V1Scan / V1Write).
  *
  * Read path: pushed filters and column pruning are translated back onto
  * the library's DataFrame scan — which is a parquet scan, so the
  * predicates continue down into the parquet reader (PushedFilters) and
  * manifest pruning applies for identity-partition equality. All pushed
  * filters are also reported back as residuals, so Spark re-applies them:
  * translation gaps cost performance only, never correctness.
  *
  * `asOf`: Left(snapshotId) for VERSION AS OF, Right(tsMillis) for
  * TIMESTAMP AS OF.
  */
class IceLiteSparkTable(tbl: IceLiteTable, asOf: Option[Either[Long, Long]])
    extends Table with SupportsRead with SupportsWrite {

  /** The engine-side table handle — IceLiteDmlRule delegates SQL
    * UPDATE/DELETE/MERGE here. */
  def underlying: IceLiteTable = tbl

  override def name(): String = tbl.location

  private def resolvedSchema: graft.icelite.TableSchema = {
    // time travel projects the SNAPSHOT's schema (the engine's
    // snapshot-scoped-schema semantics, IceLiteTable.readAsOf) — the
    // relation must advertise the SAME columns or post-evolution
    // VERSION/TIMESTAMP AS OF reads fail analysis on the schema mismatch
    val m = tbl.meta
    asOf match {
      case None => m.currentSchema
      case Some(sel) =>
        val snap = sel match {
          case Left(id) => m.snapshot(id)
          case Right(ts) => m.snapshots.filter(_.timestampMs <= ts)
            .maxByOption(_.id)
            .getOrElse(sys.error(s"no snapshot at or before $ts"))
        }
        if (snap.schemaId >= 0) m.schema(snap.schemaId) else m.currentSchema
    }
  }

  override def schema(): StructType =
    StructType(resolvedSchema.fields.map(f =>
      StructField(f.name, DataType.fromDDL(f.sparkDdl), nullable = true)))

  /** V2 columns carry the declared WRITE fill as the column's current
    * default, so a SQL INSERT that omits the column materializes it —
    * Spark's ResolveDefaultColumns reads the default from here. Only
    * foldable literals ever reach the metadata (setWriteDefault's
    * guard), so the eval below cannot touch session state. */
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] = {
    import org.apache.spark.sql.connector.catalog.{Column => V2Column, ColumnDefaultValue}
    resolvedSchema.fields.map { f =>
      val dt = DataType.fromDDL(f.sparkDdl)
      val dflt = f.writeFill.filterNot(_.trim.equalsIgnoreCase("null")).flatMap { s =>
        scala.util.Try {
          val parsed = org.apache.spark.sql.SparkSession.active
            .sessionState.sqlParser.parseExpression(s)
          val v = org.apache.spark.sql.catalyst.expressions
            .Cast(parsed, dt, Some("UTC")).eval(null)
          new ColumnDefaultValue(s,
            org.apache.spark.sql.graft.SparkShims.literalValue(v, dt))
        }.toOption
      }
      dflt match {
        case Some(d) => V2Column.create(f.name, dt, true, null, d, null)
        case None    => V2Column.create(f.name, dt, true)
      }
    }.toArray
  }

  override def properties(): util.Map[String, String] = tbl.meta.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  /** The snapshot scan this relation reads (honoring AS OF) —
    * IceLiteReadSubstitution splices its analyzed plan into SQL queries. */
  def baseDf: DataFrame = asOf match {
    case None                  => tbl.read()
    case Some(Left(snapshot))  => tbl.readAsOf(snapshot)
    case Some(Right(tsMillis)) => tbl.readAsOfTimestamp(tsMillis)
  }

  /** sources.Filter → Column for the common shapes; None = not translated
    * (Spark re-applies it post-scan anyway). */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === v)
    case sources.GreaterThan(a, v)        => Some(col(a) > v)
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case sources.LessThan(a, v)           => Some(col(a) < v)
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= v)
    case sources.In(a, vs)                => Some(col(a).isInCollection(vs.toSeq))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    case _              => None
  }

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = schema()

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters
        filters // everything is also a residual — correctness never depends on us
      }
      override def pushedFilters(): Array[Filter] = pushed
      // keep an EMPTY required schema too: count(*) prunes to zero
      // columns, and honoring that spares the V1 row bridge from
      // deserializing every column of a wide table just to count rows
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      /** Pushed comparison filters double as manifest stat-pruners: the
        * file list shrinks on the driver before Spark lists anything. */
      private def toStatFilters(fs: Array[Filter]): Seq[graft.icelite.Stats.StatFilter] = {
        import graft.icelite.Stats._
        fs.toSeq.flatMap {
          case sources.EqualTo(a, v)            => Seq(Eq(a, v))
          case sources.GreaterThan(a, v)        => Seq(Gt(a, v))
          case sources.GreaterThanOrEqual(a, v) => Seq(Ge(a, v))
          case sources.LessThan(a, v)           => Seq(Lt(a, v))
          case sources.LessThanOrEqual(a, v)    => Seq(Le(a, v))
          case sources.And(l, r)                => toStatFilters(Array(l, r))
          case _                                => Seq()
        }
      }

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        /** `spark.readStream.table(...)`: the snapshot log serves as the
          * offset ledger — appended rows per micro-batch, checkpoint-
          * recovered, pruned to the required columns. Time travel and
          * streams don't compose (a pinned past cannot grow). */
        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
          require(asOf.isEmpty, "icelite stream: cannot stream VERSION/TIMESTAMP AS OF")
          new IceLiteMicroBatchStream(tbl.location, required,
            options.asScala.toMap)
        }
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T = {
          val statPruned = asOf match {
            case None => tbl.read(statFilters = toStatFilters(pushed))
            case _    => baseDf // time-travel reads skip stat pruning (rare path)
          }
          val filtered = pushed.flatMap(toColumn).foldLeft(statPruned)(_ filter _)
          // empty required = zero-column projection (count-style scans)
          val projected =
            filtered.select(required.fields.map(f => col(f.name)).toSeq: _*)
          new IceLiteV1Relation(context, required, projected).asInstanceOf[T]
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, overwriteFlag: Boolean) =>
            if (overwrite || overwriteFlag) tbl.overwrite(data) else tbl.append(data)
        /** `df.writeStream.toTable(...)`: per-epoch executor parquet
          * writes + one atomic append-with-epoch-ledger commit each
          * micro-batch (exactly-once across restarts). Append mode only —
          * a streaming truncate-per-epoch would rewrite the table's
          * history every batch. */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!overwrite,
            "icelite streaming sink: append output mode only (complete/truncate " +
              "would rewrite the table every epoch — aggregate downstream instead)")
          new IceLiteStreamingWrite(tbl.location, info.schema(), info.queryId())
        }
      }
    }
}

class IceLiteV1Relation(
    val sqlContext: SQLContext, override val schema: StructType, df: DataFrame)
    extends BaseRelation with TableScan {
  override def buildScan(): RDD[Row] = df.rdd
}
