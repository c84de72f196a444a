package graft.icelite

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IceLite catalog (SURVEY.md §2.1 S11): namespaces → tables → metadata,
  * the Scala analog of the reference's Iceberg REST catalog client
  * (/root/reference/README.md:1042–1068 — GET /v1/namespaces,
  * /v1/namespaces/{ns}/tables, /v1/namespaces/{ns}/tables/{t}).
  *
  * Layout: `<warehouse>/<namespace>/<table>/metadata/version-hint.text`.
  * Namespace = one directory level; a table is any directory with a
  * metadata hint file. loadTable returns the live [[IceLiteTable]];
  * tableMetadataJson returns the raw metadata document (the REST
  * GetTable response analog).
  */
class Catalog(spark: SparkSession, warehouse: String) {
  private def f = IceLite.fs(spark, warehouse)

  def createNamespace(ns: String): Unit = f.mkdirs(new Path(warehouse, ns))

  def listNamespaces(): Seq[String] = {
    val root = new Path(warehouse)
    if (!f.exists(root)) return Seq()
    f.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
  }

  def listTables(ns: String): Seq[String] = {
    val dir = new Path(warehouse, ns)
    if (!f.exists(dir)) return Seq()
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, s"metadata/${IceLite.HINT}")))
      .map(_.getName).sorted.toSeq
  }

  def tableLocation(ns: String, name: String): String =
    new Path(new Path(warehouse, ns), name).toString

  def createTable(
      ns: String, name: String, schema: Seq[(String, String)],
      partition: Seq[(String, String)] = Seq(),
      properties: Map[String, String] = Map()): IceLiteTable = {
    createNamespace(ns)
    IceLite.create(spark, tableLocation(ns, name), schema, partition, properties)
  }

  def loadTable(ns: String, name: String): IceLiteTable = {
    val loc = tableLocation(ns, name)
    require(f.exists(new Path(loc, s"metadata/${IceLite.HINT}")), s"no such table $ns.$name")
    IceLite.load(spark, loc)
  }

  /** Raw current metadata JSON — the REST GetTable response analog. */
  def tableMetadataJson(ns: String, name: String): String =
    MetaJson.toJson(loadTable(ns, name).meta)

  def dropTable(ns: String, name: String): Unit =
    f.delete(new Path(tableLocation(ns, name)), true)

  /** Catalog listing as a DataFrame (namespace, table, location). */
  def tablesDf: DataFrame = {
    import spark.implicits._
    listNamespaces().flatMap(ns => listTables(ns).map(t => (ns, t, tableLocation(ns, t))))
      .toDF("namespace", "table", "location")
  }
}
