package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata tables (TESTDATA.md). Plain
  * `spark.read.parquet` — schema comes from the footer, filters/projections
  * push down via the vectorized parquet source.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = t(s, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * (legacy.parquet.nanosAsLong) and convert with integer division —
    * `ts div 1000` keeps full precision (a double division would lose
    * bits at 1.7e18) and floor-matches DuckDB's own ns→µs truncation.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
