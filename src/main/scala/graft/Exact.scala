package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent float aggregation.
  *
  * Summing doubles is not associative, so a Spark partial/final aggregate
  * over 32 shuffle partitions and DuckDB's single-threaded sum can disagree
  * in the last bits — enough to flip a `round(…, 2)` and fail the driver's
  * hash compare. The input data carries fixed-point values (2-decimal money,
  * 4-decimal derived products), so we cast to decimal FIRST (exact, since the
  * doubles were produced from ≤2-decimal literals), sum exactly (decimal add
  * is associative — any partition order gives the same result, on a laptop or
  * a 1000-executor cluster), and only then convert back to double. The final
  * double conversion + round is a single deterministic IEEE operation on an
  * identical exact value in both engines.
  */
object Exact {
  /** Exact sum of a fixed-point double column, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** dsum rounded to `r` decimals (the usual output form). */
  def dsumR(c: Column, scale: Int = 2, r: Int = 2): Column =
    round(dsum(c, scale), r)

  /** Exact-sum-based average, rounded to `r` decimals. */
  def davgR(c: Column, scale: Int = 2, r: Int = 2): Column =
    round(dsum(c, scale) / count(lit(1)), r)

  /** SQL fragments for the DuckDB oracle — identical arithmetic. */
  def sqlSum(expr: String, scale: Int = 2, r: Int = 2): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE), $r)"
  /** Unrounded exact sum (for derived statistics that round at the end). */
  def sqlSumRaw(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE)"
  def sqlAvg(expr: String, scale: Int = 2, r: Int = 2): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE) / count(*), $r)"
}
