package graft.icelite

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One parsed entry of the `write.sort-order` table property.
  *
  * The property grammar is a comma-joined list of
  * `[transform(]column[)] [asc|desc] [nulls-first|nulls-last]` entries —
  * a bare column name means identity/asc/nulls-first, so every
  * pre-existing plain-CSV property parses to exactly its old meaning.
  * Transforms are the Iceberg sort-transform family IceLite can apply
  * at write time: `truncate[W]`, `bucket[N]` (xxhash64, native),
  * `mbucket[N]` (Iceberg-spec murmur3, adopted layouts), `year`,
  * `month`, `day`. Examples:
  * {{{
  *   id
  *   ts desc nulls-last
  *   truncate[4](code) desc nulls-last, id
  * }}}
  */
final case class SortField(
    column: String, transform: String, desc: Boolean, nullsLast: Boolean) {
  /** Canonical property spelling; bare identity/asc/nulls-first renders
    * as the plain column name, so round-tripping old properties is
    * byte-stable. */
  def render: String = {
    val base = if (transform == "identity") column else s"$transform($column)"
    base + (if (desc) " desc" else "") + (if (nullsLast) " nulls-last" else "")
  }
}

object SortOrders {
  // the closing paren is tied to the transform group (either
  // `transform(col)` whole or a bare column) so mismatched parens —
  // `truncate[4](code` unclosed, stray `code)` — reach the loud
  // malformed-entry branch instead of parsing as something else
  private val EntryRe =
    """^(?:(year|month|day|truncate\[\d+\]|m?bucket\[\d+\])\(([^()\s,]+)\)|([^()\s,]+))(?:\s+(asc|desc))?(?:\s+(nulls-first|nulls-last))?$""".r

  /** Parse the property value; malformed entries fail loudly (a sort
    * order that silently drops a field would cluster the wrong way). */
  def parse(csv: String): Seq[SortField] =
    csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case EntryRe(tr, colT, colBare, dir, nulls) => SortField(
        Option(colT).getOrElse(colBare), Option(tr).getOrElse("identity"),
        dir == "desc", nulls == "nulls-last")
      case bad => sys.error(s"malformed write.sort-order entry '$bad'")
    }

  def render(fs: Seq[SortField]): String = fs.map(_.render).mkString(",")

  /** Source column names, for DDL guards (drop-column etc.). */
  def columns(csv: String): Seq[String] = parse(csv).map(_.column)

  /** The transform as a Spark expression over the source column — any
    * monotone-equivalent encoding sorts and range-partitions the same
    * way as the Iceberg-defined value, which is all write clustering
    * needs. `dtype` is the source's declared type (truncate is
    * width-prefix on strings, W-multiple floor on integers). */
  def transformCol(tr: String, c: Column, dtype: String): Column = tr match {
    case "identity" => c
    case "year"     => year(c)
    case "month"    => year(c) * 12 + month(c)
    case "day"      => datediff(c, to_date(lit("1970-01-01")))
    case t if t.startsWith("truncate[") && t.endsWith("]") =>
      val w = t.stripPrefix("truncate[").stripSuffix("]").toInt
      require(w > 0, s"truncate width must be positive: $t")
      val dt = dtype.toUpperCase
      if (dt.startsWith("STRING") || dt.startsWith("VARCHAR") || dt.startsWith("CHAR"))
        substring(c, 1, w)
      else c - pmod(c, lit(w)) // Iceberg truncate: v - (((v % W) + W) % W)
    case t if t.startsWith("mbucket[") && t.endsWith("]") =>
      val n = t.stripPrefix("mbucket[").stripSuffix("]").toInt
      org.apache.spark.sql.graft.SparkShims.columnOf(
        graft.functions.IcebergBucket(
          org.apache.spark.sql.graft.SparkShims.toExpression(c), n))
    case t if t.startsWith("bucket[") && t.endsWith("]") =>
      val n = t.stripPrefix("bucket[").stripSuffix("]").toInt
      pmod(xxhash64(c), lit(n))
    case other => sys.error(s"unknown sort transform $other")
  }

  /** Resolve every transform against the DECLARED column types (an empty
    * local relation forced through analysis) — catches the type-level
    * misfits building an unresolved Column cannot (`day(a_bigint)`,
    * `truncate[4](a_date)` only fail once Catalyst resolves them).
    * Throws the analysis error; callers that must not fail (adoption)
    * wrap in Try and drop the order whole. */
  def validate(spark: org.apache.spark.sql.SparkSession, fs: Seq[SortField],
      fieldOf: String => (String, String)): Unit = {
    import org.apache.spark.sql.types.{DataType, StructField, StructType}
    val resolved = fs.map { f => val (phys, dt) = fieldOf(f.column); (phys, dt, f) }
    val schema = StructType(resolved.map { case (p, dt, _) =>
      StructField(p, DataType.fromDDL(dt)) }.distinctBy(_.name))
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .select(resolved.map { case (p, dt, f) =>
        transformCol(f.transform, col(p), dt) }: _*)
      .schema
    ()
  }

  /** The full ordered Column (transform + direction + null order) for
    * `repartitionByRange` / `sortWithinPartitions`. */
  def orderCol(f: SortField, src: Column, dtype: String): Column = {
    val base = transformCol(f.transform, src, dtype)
    (f.desc, f.nullsLast) match {
      case (false, false) => base.asc_nulls_first
      case (false, true)  => base.asc_nulls_last
      case (true, false)  => base.desc_nulls_first
      case (true, true)   => base.desc_nulls_last
    }
  }
}
