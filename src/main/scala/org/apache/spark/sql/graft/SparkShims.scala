package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into Spark's `private[sql]` surface, used by the IceLite
  * DSv2 connector (the same trick every third-party table format uses to
  * plug logical plans in and out of a live session). Kept to three
  * one-liners so the private-API exposure is auditable at a glance.
  */
object SparkShims {

  /** A DataFrame over an already-analyzed logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan under a DataFrame (for splicing an IceLite
    * scan into a SQL query plan). */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed

  /** Collect a (small, driver-local) DataFrame as InternalRows — the shape
    * DSv2 LocalScan serves. */
  def collectInternal(df: DataFrame): Array[InternalRow] =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.executedPlan.executeCollect()

  /** The (possibly unresolved) expression under a Column — for pattern-
    * matching simple comparison shapes into manifest stat filters. Forces
    * the ColumnNode → Catalyst conversion (ExpressionUtils alone returns a
    * lazy ColumnNodeExpression wrapper). */
  def toExpression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** A Column over a raw Catalyst expression (e.g. a custom codegen
    * Predicate with UnresolvedAttribute children, resolved at analysis). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** A connector-side literal (the value a v2 ColumnDefaultValue carries
    * as its EXISTS_DEFAULT) — LiteralValue is `private[sql]`. */
  def literalValue(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[Any] =
    org.apache.spark.sql.connector.expressions.LiteralValue(v, dt)

  /** Drain the listener bus — lets tests assert "zero jobs ran" without
    * racing event delivery. */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
