package graft.icelite.connector

import graft.icelite.{Catalog, IceLiteTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, DataTypes, StructField, StructType}

/** `CALL icelite.system.*` maintenance procedures via Spark 4's DSv2
  * procedure API (the reference runs these as Spark SQL procedures,
  * /root/reference/README.md:1013–1028):
  *
  * {{{
  * CALL icelite.system.rollback_to_snapshot('db.t', 1)
  * CALL icelite.system.rewrite_data_files('db.t', 2)
  * CALL icelite.system.expire_snapshots('db.t', <older_than_epoch_ms>)
  * CALL icelite.system.remove_orphan_files('db.t', <older_than_epoch_ms>)
  * }}}
  *
  * Each bound procedure runs the engine-side maintenance op and returns a
  * one-row LocalScan summary (metadata-scale — no distributed result). */
object IceLiteProcedures {

  /** 'db.table' → (db, table), with a clear error instead of the bare
    * MatchError a dot-less ref would otherwise throw from destructuring. */
  private def splitRef(ref: String): (String, String) = {
    val i = ref.indexOf('.')
    require(i > 0 && i < ref.length - 1,
      s"table argument must be 'db.table', got '$ref'")
    (ref.substring(0, i), ref.substring(i + 1))
  }


  val Names: Seq[String] = Seq(
    "rollback_to_snapshot", "rewrite_data_files", "expire_snapshots", "remove_orphan_files",
    "create_branch", "create_tag", "fast_forward", "drop_ref", "rewrite_zorder",
    "create_changelog_view", "rewrite_position_delete_files")

  def load(warehouse: String, name: String): UnboundProcedure = name match {
    case "rollback_to_snapshot" => proc(warehouse, name, "snapshot_id",
      out = Seq("current_snapshot_id" -> DataTypes.LongType)) { (t, arg) =>
        t.rollbackTo(arg)
        Seq(t.meta.currentSnapshotId.getOrElse(-1L))
      }
    case "rewrite_data_files" => proc(warehouse, name, "target_files",
      out = Seq("files_before" -> DataTypes.LongType, "files_after" -> DataTypes.LongType)) { (t, arg) =>
        val before = t.meta.currentSnapshot.map(_.dataFiles.size.toLong).getOrElse(0L)
        t.compact(arg.toInt)
        Seq(before, t.meta.currentSnapshot.map(_.dataFiles.size.toLong).getOrElse(0L))
      }
    case "rewrite_position_delete_files" => proc(warehouse, name, "target_files",
      out = Seq("delete_files_before" -> DataTypes.LongType,
        "delete_files_after" -> DataTypes.LongType)) { (t, arg) =>
        def posCount = t.meta.currentSnapshot
          .map(_.deleteFiles.count(_.kind == "pos").toLong).getOrElse(0L)
        val before = posCount
        t.rewritePositionDeletes(arg.toInt)
        Seq(before, posCount)
      }
    case "expire_snapshots" => proc(warehouse, name, "older_than_ms",
      out = Seq("remaining_snapshots" -> DataTypes.LongType)) { (t, arg) =>
        t.expireSnapshots(arg)
        Seq(t.meta.snapshots.size.toLong)
      }
    case "remove_orphan_files" => proc(warehouse, name, "older_than_ms",
      out = Seq("removed_files" -> DataTypes.LongType)) { (t, arg) =>
        Seq(t.removeOrphanFiles(olderThanMs = arg).size.toLong)
      }
    case "create_branch" => procStr(warehouse, name, "branch",
      out = Seq("head_snapshot_id" -> DataTypes.LongType)) { (t, ref) =>
        t.createBranch(ref)
        Seq(t.meta.refs(ref).snapshotId)
      }
    case "create_tag" => procStr(warehouse, name, "tag",
      out = Seq("tagged_snapshot_id" -> DataTypes.LongType)) { (t, ref) =>
        t.createTag(ref, t.meta.currentSnapshotId.getOrElse(sys.error("empty table")))
        Seq(t.meta.refs(ref).snapshotId)
      }
    case "fast_forward" => procStr(warehouse, name, "branch",
      out = Seq("current_snapshot_id" -> DataTypes.LongType)) { (t, ref) =>
        t.fastForward(ref)
        Seq(t.meta.currentSnapshotId.getOrElse(-1L))
      }
    case "drop_ref" => procStr(warehouse, name, "ref",
      out = Seq("remaining_refs" -> DataTypes.LongType)) { (t, ref) =>
        t.dropRef(ref)
        Seq(t.meta.refs.size.toLong)
      }
    case "rewrite_zorder" => new UnboundProcedure {
      // CALL icelite.system.rewrite_zorder('db.t', 'c1,c2', 16)
      override def name(): String = "rewrite_zorder"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "rewrite_zorder"
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in("columns", DataTypes.StringType).build(),
          ProcedureParameter.in("target_files", DataTypes.LongType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val (ns, tn) = splitRef(input.getUTF8String(0).toString)
          val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
          require(cols.length == 2, s"rewrite_zorder takes exactly 2 columns, got ${cols.length}")
          val target = input.getLong(2)
          val t = new Catalog(SparkSession.active, warehouse).loadTable(ns, tn)
          t.compactZOrder(target.toInt, cols(0), cols(1))
          val schema = StructType(Seq(StructField("files_after", DataTypes.LongType, nullable = false)))
          val row: InternalRow = new GenericInternalRow(
            Array[Any](Long.box(t.meta.currentSnapshot.map(_.dataFiles.size.toLong).getOrElse(0L))))
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = schema
          }).iterator()
        }
      }
    }
    case "create_changelog_view" => new UnboundProcedure {
      // CALL icelite.system.create_changelog_view('db.t', 0, 4, 'changes_v'
      //   [, row_lineage])
      // → registers a temp view of readChangesBetween(0, 4) named changes_v
      //   (Iceberg's spark procedure of the same name). The optional 5th
      //   argument (default false) switches the view to LINEAGE mode:
      //   change rows carry (_row_id, _last_updated_sequence_number), so
      //   an update's delete+insert pair shares a stable identity — the
      //   SQL surface for readChangesBetween(rowLineage = true).
      override def name(): String = "create_changelog_view"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "create_changelog_view"
        override def parameters(): Array[ProcedureParameter] = {
          val base = Array(
            ProcedureParameter.in("table", DataTypes.StringType).build(),
            ProcedureParameter.in("from_snapshot", DataTypes.LongType).build(),
            ProcedureParameter.in("to_snapshot", DataTypes.LongType).build(),
            ProcedureParameter.in("view_name", DataTypes.StringType).build())
          if (inputType.fields.length >= 5)
            base :+ ProcedureParameter.in("row_lineage", DataTypes.BooleanType).build()
          else base
        }
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val (ns, tn) = splitRef(input.getUTF8String(0).toString)
          val from = input.getLong(1)
          val to = input.getLong(2)
          val view = input.getUTF8String(3).toString
          val lineage = input.numFields >= 5 && !input.isNullAt(4) && input.getBoolean(4)
          val t = new Catalog(SparkSession.active, warehouse).loadTable(ns, tn)
          t.readChangesBetween(from, to, rowLineage = lineage)
            .createOrReplaceTempView(view)
          val schema = StructType(Seq(
            StructField("changelog_view", DataTypes.StringType, nullable = false)))
          val row: InternalRow = new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(view)))
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = schema
          }).iterator()
        }
      }
    }
    case other => sys.error(s"no such procedure icelite.system.$other " +
      s"(available: ${Names.mkString(", ")})")
  }

  /** One (table STRING, <argName> STRING) → one-row summary procedure —
    * the ref-management (branch/tag) family. */
  private def procStr(warehouse: String, name0: String, argName: String,
      out: Seq[(String, DataType)])(body: (IceLiteTable, String) => Seq[Long]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = name0
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = name0
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in(argName, DataTypes.StringType).build())
        override def isDeterministic: Boolean = false // mutates table state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tableRef = input.getUTF8String(0).toString
          val arg = input.getUTF8String(1).toString
          val (ns, tn) = splitRef(tableRef)
          val t = new Catalog(SparkSession.active, warehouse).loadTable(ns, tn)
          val values = body(t, arg)
          val schema = StructType(out.map { case (n, dt) => StructField(n, dt, nullable = false) })
          val row: InternalRow = new GenericInternalRow(values.map(Long.box).toArray[Any])
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = schema
          }).iterator()
        }
      }
    }

  /** One (table STRING, <argName> BIGINT) → one-row BIGINT-columns
    * procedure. Table is 'namespace.table' within this catalog's
    * warehouse, the Iceberg CALL convention. */
  private def proc(warehouse: String, name0: String, argName: String,
      out: Seq[(String, DataType)])(body: (IceLiteTable, Long) => Seq[Long]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = name0
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = name0
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", DataTypes.StringType).build(),
          ProcedureParameter.in(argName, DataTypes.LongType).build())
        override def isDeterministic: Boolean = false // mutates table state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tableRef = input.getUTF8String(0).toString
          val arg = input.getLong(1)
          val (ns, tn) = splitRef(tableRef)
          val t = new Catalog(SparkSession.active, warehouse).loadTable(ns, tn)
          val values = body(t, arg)
          val schema = StructType(out.map { case (n, dt) => StructField(n, dt, nullable = false) })
          val row: InternalRow = new GenericInternalRow(values.map(Long.box).toArray[Any])
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = schema
          }).iterator()
        }
      }
    }
}
