package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge between Catalyst `Expression` and the public `Column` API.
  *
  * Spark 4 split `Column` from Catalyst (`Column` now wraps a `ColumnNode`);
  * the converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is package-private to `org.apache.spark.sql` — hence this shim
  * lives in that package (the standard pattern for Spark extension
  * libraries shipping custom expressions).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for building custom plan nodes
    * from already-resolved child attributes). */
  def analyzed(df: Dataset[_]): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into the public DataFrame API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to this session (the public
    * `experimental.extraStrategies` hook; prepended to the planner). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
