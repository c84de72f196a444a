package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in [[Registry]] (one module per SURVEY §2
  * family); this object is just the stable entry surface.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A4 `complex_agg` — the reference's benchmark aggregation
    * (/root/reference/README.md:799–809). */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("complex_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose internals are
    * engine-specific (hash-based LSH, IVF cells) — driver records a
    * rows-only check for those. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
