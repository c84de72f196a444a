package graft.icelite

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import scala.jdk.CollectionConverters._

/** File-level data skipping (the file-granularity analog of the row-group
  * stats pruning the reference teaches, README.md:327–346).
  *
  * At write, per-column min/max are harvested from the parquet footer (the
  * writer already opens it for row counts — stats ride along for free) and
  * stored field-id-keyed in the manifest. At read, simple comparison
  * predicates prune the FILE LIST on the driver before Spark lists a single
  * file — on a 100 TB table a selective predicate touches only the files
  * whose [min,max] admits it, independent of partition layout.
  *
  * Pruning is conservative: no stats, unparseable values, or unsupported
  * types ⇒ the file is kept. Callers always re-apply the real filter, so
  * skipping is purely an IO optimization, never a correctness dependence.
  */
object Stats {

  /** Harvest per-column min/max from an open footer; keys are field ids
    * (physical column names are `f<id>`). */
  def fromFooter(reader: ParquetFileReader): Map[Int, ColumnStats] = {
    val perColumn = scala.collection.mutable.Map[Int, (Any, Any, PrimitiveTypeName, Boolean)]()
    for (block <- reader.getFooter.getBlocks.asScala;
         c <- block.getColumns.asScala) {
      val name = c.getPath.toDotString
      if (name.startsWith("f") && name.drop(1).forall(_.isDigit)) {
        val fid = name.drop(1).toInt
        val st = c.getStatistics
        if (st != null && !st.isEmpty && st.hasNonNullValue) {
          val prim = c.getPrimitiveType.getPrimitiveTypeName
          val isString = c.getPrimitiveType.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
          val (mn, mx) = (st.genericGetMin, st.genericGetMax)
          perColumn.get(fid) match {
            case None => perColumn(fid) = (mn, mx, prim, isString)
            case Some((omn, omx, p, s)) =>
              perColumn(fid) = (minOf(omn, mn, p, s), maxOf(omx, mx, p, s), p, s)
          }
        } else perColumn.remove(fid) // any stat-less block poisons the column
      }
    }
    perColumn.flatMap { case (fid, (mn, mx, prim, isString)) =>
      for (a <- render(mn, prim, isString); b <- render(mx, prim, isString))
        yield fid -> ColumnStats(a, b)
    }.toMap
  }

  private def cmp(a: Any, b: Any, p: PrimitiveTypeName, isString: Boolean): Int =
    (p, isString) match {
      case (PrimitiveTypeName.BINARY, true) =>
        a.asInstanceOf[Binary].toStringUsingUTF8.compareTo(b.asInstanceOf[Binary].toStringUsingUTF8)
      case (PrimitiveTypeName.INT64, _) | (PrimitiveTypeName.INT32, _) =>
        java.lang.Long.compare(a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.DOUBLE, _) | (PrimitiveTypeName.FLOAT, _) =>
        java.lang.Double.compare(a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue)
      case _ => 0
    }
  private def minOf(a: Any, b: Any, p: PrimitiveTypeName, s: Boolean): Any =
    if (cmp(a, b, p, s) <= 0) a else b
  private def maxOf(a: Any, b: Any, p: PrimitiveTypeName, s: Boolean): Any =
    if (cmp(a, b, p, s) >= 0) a else b

  private def render(v: Any, p: PrimitiveTypeName, isString: Boolean): Option[String] =
    (p, isString) match {
      case (PrimitiveTypeName.BINARY, true) => Some(v.asInstanceOf[Binary].toStringUsingUTF8)
      case (PrimitiveTypeName.INT32, _) | (PrimitiveTypeName.INT64, _) =>
        Some(v.asInstanceOf[Number].longValue.toString)
      case (PrimitiveTypeName.FLOAT, _) | (PrimitiveTypeName.DOUBLE, _) =>
        Some(v.asInstanceOf[Number].doubleValue.toString)
      case _ => None // booleans, non-string binaries (decimals): no skipping
    }

  // ----------------------------------------------------------- predicates

  sealed trait StatFilter { def column: String; def value: Any }
  final case class Eq(column: String, value: Any) extends StatFilter
  final case class Lt(column: String, value: Any) extends StatFilter
  final case class Le(column: String, value: Any) extends StatFilter
  final case class Gt(column: String, value: Any) extends StatFilter
  final case class Ge(column: String, value: Any) extends StatFilter

  /** May `file` contain rows satisfying `flt`? Conservative true. */
  def mayContain(file: DataFile, fileSchema: TableSchema, current: TableSchema,
      flt: StatFilter): Boolean = {
    val field = current.fields.find(_.name == flt.column).getOrElse(return true)
    if (!fileSchema.hasId(field.id)) return true // column absent: default/null rows
    val cs = file.stats.getOrElse(field.id, return true)
    val v = normalize(flt.value, field.dtype).getOrElse(return true)
    val (mn, mx) = (parse(cs.min, field.dtype), parse(cs.max, field.dtype)) match {
      case (Some(a), Some(b)) => (a, b)
      case _                  => return true
    }
    flt match {
      case _: Eq => ord(mn, v) <= 0 && ord(v, mx) <= 0
      case _: Lt => ord(mn, v) < 0
      case _: Le => ord(mn, v) <= 0
      case _: Gt => ord(v, mx) < 0
      case _: Ge => ord(v, mx) <= 0
    }
  }

  private def ord(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _                      => 0
  }

  /** Stat string → comparable domain value for the field's logical type. */
  private def parse(s: String, dtype: String): Option[Any] = domain(dtype) match {
    case "long"   => s.toLongOption
    case "double" => s.toDoubleOption
    case "string" => Some(s)
    case _        => None
  }

  /** Predicate constant → same comparable domain. */
  private def normalize(v: Any, dtype: String): Option[Any] = (domain(dtype), v) match {
    case ("long", n: Number)  => Some(n.longValue)
    case ("long", t: java.sql.Timestamp) => // stats store raw micros
      Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case ("long", i: java.time.Instant) =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case ("long", d: java.time.LocalDateTime) => // timestamp_ntz micros
      Some(d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000)
    case ("long", d: java.sql.Date)       => Some(d.toLocalDate.toEpochDay)
    case ("long", d: java.time.LocalDate) => Some(d.toEpochDay)
    case ("double", n: Number) => Some(n.doubleValue)
    case ("string", s: String) => Some(s)
    case _ => None
  }

  private def domain(dtype: String): String = {
    val t = dtype.toUpperCase
    if (t.startsWith("BIGINT") || t.startsWith("INT") || t.startsWith("SMALLINT") ||
      t.startsWith("DATE") || t.startsWith("TIMESTAMP")) "long"
    else if (t.startsWith("DOUBLE") || t.startsWith("FLOAT")) "double"
    else if (t.startsWith("STRING") || t.startsWith("VARCHAR")) "string"
    else "unsupported"
  }
}
