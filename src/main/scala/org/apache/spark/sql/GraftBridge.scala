package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors so the engine can
  * materialize a DataFrame from a custom LogicalPlan (the standard
  * technique for third-party Catalyst operators). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4
    * removed the public Column(expr) constructor). */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Recover the Catalyst Expression behind a Column. */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Unload every loaded streaming state-store provider
    * (`StateStore.unloadAll` is private[sql]) — see
    * graft.queries.Streaming.unloadStateStores for the rationale. */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
