package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable operator: a Spark query over the testdata tables in
  * `dir` plus (optionally) the equivalent ANSI SQL the driver runs in DuckDB
  * on the same parquet tables.
  *
  * Determinism rules (SURVEY.md §7.1): every query has a total ORDER BY,
  * float aggregates go through decimal-exact sums ([[Exact]]) before
  * rounding, timestamps are surfaced as DATE / epoch seconds / strings, and
  * integer-typed outputs are BIGINT on both sides (DuckDB's `sum(int)` is
  * HUGEINT and `year()` is BIGINT, so the Spark side casts to long).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Registry {
  /** All operator modules, in SURVEY.md §2 order. */
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Joins.defs ++
      operators.Sources.defs ++
      operators.VariantOps.defs ++
      operators.WindowOps.defs ++
      operators.TemporalOps.defs ++
      operators.SketchOps.defs ++
      operators.GeoOps.defs ++
      operators.TextOps.defs ++
      operators.GraphOps.defs ++
      operators.BehaviorOps.defs ++
      operators.QualityOps.defs ++
      operators.PipelineOps.defs ++
      operators.VectorOps.defs ++
      operators.Multimodal.defs ++
      operators.LakehouseOps.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
