package graft.icelite.connector

import java.util

import graft.icelite.IceLiteTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** SQL metadata tables (`SELECT * FROM icelite.db.t.snapshots|history|
  * partitions|files` — /root/reference/README.md:982–1004), resolved by
  * [[IceLiteCatalog]] from the 4-part identifier.
  *
  * Served as a DSv2 [[LocalScan]]: the rows are metadata-scale (one per
  * snapshot/partition/file) and already live in the driver's table
  * metadata, so Spark plans a LocalTableScan — no distributed read, no V1
  * bridge. Recomputed on every scan, so a query always sees the current
  * table state. */
class IceLiteMetaTable(tbl: IceLiteTable, kind: String) extends Table with SupportsRead {

  private def df: DataFrame = kind match {
    case "snapshots"  => tbl.snapshotsDf
    case "history"    => tbl.historyDf
    case "partitions" => tbl.partitionsDf
    case "files"      => tbl.filesDf
    case "refs"       => tbl.refsDf
    case other        => sys.error(s"unknown metadata table $other")
  }

  override def name(): String = s"${tbl.location}#$kind"

  override def schema(): StructType = df.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = SparkShims.collectInternal(df)
        override def readSchema(): StructType = schema()
      }
    }
}

object IceLiteMetaTable {
  val Kinds: Set[String] = Set("snapshots", "history", "partitions", "files", "refs")
}
