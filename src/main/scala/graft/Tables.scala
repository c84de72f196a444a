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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * vintages and TIMESTAMP(MICROS) in others, so branch on the loaded
    * schema rather than assuming either:
    *  - LongType (TIMESTAMP(NANOS) read under legacy.parquet.nanosAsLong,
    *    which Spark 4 otherwise rejects with PARQUET_TYPE_ILLEGAL): convert
    *    with integer division — `ts div 1000` keeps full precision (a
    *    double division would lose bits at 1.7e18) and floor-matches
    *    DuckDB's own ns→µs truncation.
    *  - TimestampNTZType (plain timestamp[us], no tz): cast to TIMESTAMP
    *    under the session's UTC zone so downstream date/interval arithmetic
    *    behaves identically across vintages.
    *  - TimestampType: pass through.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Self-install the UTC invariant the NTZ branch depends on: the
    // cast("timestamp") below reinterprets wall-clock under the session
    // zone, so an entry point that forgot to set UTC would get silently
    // shifted instants vs the DuckDB oracle (which reads naive micros).
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  /** `embeddings.embedding` ships as list<float> today; pin that type so a
    * future testdata regeneration as list<double> degrades to a narrow cast
    * instead of failing analysis in every array<float>-typed kernel
    * (graft.functions.DotScaled and friends) — the same vintage-drift
    * lesson as [[events]]. */
  def embeddings(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = t(s, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case _ => raw.withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** One resolved relation per (session, dir, table) — NOT a data cache.
    * Every `spark.read.parquet(path)` call schedules a footer
    * schema-inference job before the first action; a bench sweep that
    * references these tables hundreds of times otherwise pays that job
    * (and a fresh file listing) per reference. The memoized DataFrame is
    * an immutable logical plan: every action on it still scans the
    * parquet from disk, so nothing is precomputed or persisted across
    * queries — only the schema resolution is shared, exactly like reading
    * through a catalog table instead of a bare path. */
  private val relMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    relMemo.computeIfAbsent((s, dir, name),
      kv => kv._1.read.parquet(s"${kv._2}/${kv._3}.parquet"))
}
