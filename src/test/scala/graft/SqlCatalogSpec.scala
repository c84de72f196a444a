package graft

import java.nio.file.Files

/** The DSv2 SQL surface (SURVEY.md §7.4): CREATE/INSERT/SELECT with time
  * travel, ALTER TABLE evolution, SHOW — all through `spark.sql` against
  * the `icelite` catalog, using a suite-private catalog name (Spark caches catalog instances per name, so a shared name would pin whichever warehouse initialized first), mirroring the reference's Spark-SQL-on-Iceberg
  * session (README.md:901–1029).
  */
class SqlCatalogSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("sqlcat_wh").toString

  private def initCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.ilsql", "graft.icelite.connector.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ilsql.warehouse", wh)
  }

  test("full SQL lifecycle: create, insert, select, time travel, alter") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ilsql.db")
    spark.sql("""CREATE TABLE ilsql.db.orders (
                   order_id BIGINT, status STRING, amount DOUBLE, order_date DATE)
                 PARTITIONED BY (months(order_date))""")
    assert(spark.sql("SHOW TABLES IN ilsql.db").collect().map(_.getString(1)).contains("orders"))

    spark.sql("""INSERT INTO ilsql.db.orders VALUES
                 (1, 'OPEN', 10.5, DATE'2024-01-05'),
                 (2, 'OPEN', 20.0, DATE'2024-02-10')""")
    spark.sql("INSERT INTO ilsql.db.orders VALUES (3, 'CLOSED', 30.0, DATE'2024-02-15')")

    assert(spark.sql("SELECT count(*) FROM ilsql.db.orders").head.getLong(0) == 3)
    // predicate + projection through the pushdown bridge
    val open = spark.sql(
      "SELECT order_id FROM ilsql.db.orders WHERE status = 'OPEN' ORDER BY order_id")
      .collect().map(_.getLong(0)).toSeq
    assert(open == Seq(1L, 2L))

    // time travel: snapshot 1 = first insert only
    assert(spark.sql("SELECT count(*) FROM ilsql.db.orders VERSION AS OF 1")
      .head.getLong(0) == 2)

    // schema evolution via SQL — metadata-only
    spark.sql("ALTER TABLE ilsql.db.orders ADD COLUMN note STRING")
    spark.sql("ALTER TABLE ilsql.db.orders RENAME COLUMN note TO comment")
    val cols = spark.sql("SELECT * FROM ilsql.db.orders").columns.toSeq
    assert(cols.contains("comment") && !cols.contains("note"))
    spark.sql("INSERT INTO ilsql.db.orders VALUES (4, 'OPEN', 5.0, DATE'2024-03-01', 'hi')")
    val note = spark.sql(
      "SELECT comment FROM ilsql.db.orders WHERE order_id = 4").head.getString(0)
    assert(note == "hi")
    assert(spark.sql(
      "SELECT comment FROM ilsql.db.orders WHERE order_id = 1").head.isNullAt(0))
  }

  test("INSERT OVERWRITE replaces content in one snapshot") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ilsql.db2")
    spark.sql("CREATE TABLE ilsql.db2.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO ilsql.db2.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT OVERWRITE ilsql.db2.t VALUES (9, 9.0)")
    val rows = spark.sql("SELECT id FROM ilsql.db2.t").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(9L))
    // previous content still reachable via time travel
    assert(spark.sql("SELECT count(*) FROM ilsql.db2.t VERSION AS OF 1").head.getLong(0) == 2)
  }

  test("TIMESTAMP AS OF resolves to the snapshot live at that time") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ilsql.db3")
    spark.sql("CREATE TABLE ilsql.db3.t (id BIGINT)")
    spark.sql("INSERT INTO ilsql.db3.t VALUES (1)")
    val cat = new graft.icelite.Catalog(spark, wh)
    val ts1 = cat.loadTable("db3", "t").meta.snapshot(1).timestampMs
    Thread.sleep(10)
    spark.sql("INSERT INTO ilsql.db3.t VALUES (2)")
    val tsStr = new java.sql.Timestamp(ts1).toString
    assert(spark.sql(s"SELECT count(*) FROM ilsql.db3.t TIMESTAMP AS OF '$tsStr'")
      .head.getLong(0) == 1)
  }

  test("filters push into the underlying parquet scan through the bridge") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ilsql.db4")
    spark.sql("CREATE TABLE ilsql.db4.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO ilsql.db4.t SELECT id, id * 1.5 FROM range(1000)")
    val df = spark.sql("SELECT v FROM ilsql.db4.t WHERE id = 7")
    assert(df.head.getDouble(0) == 10.5)
    val inner = df.queryExecution.executedPlan.toString
    assert(inner.contains("PushedFilters") || inner.contains("RowDataSourceScan"),
      s"unexpected plan shape:\n$inner")
  }

  test("drop table and namespace") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ilsql.db5")
    spark.sql("CREATE TABLE ilsql.db5.gone (id BIGINT)")
    spark.sql("DROP TABLE ilsql.db5.gone")
    assert(spark.sql("SHOW TABLES IN ilsql.db5").collect().isEmpty)
    spark.sql("DROP NAMESPACE ilsql.db5")
    assert(!spark.sql("SHOW NAMESPACES IN ilsql").collect()
      .map(_.getString(0)).contains("db5"))
  }
}
