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

  /** Unpersist every `LogicalRDD` leaf of `df`'s analyzed plan — the
    * underlying RDD of a `localCheckpoint`ed frame. Non-blocking; returns
    * how many RDDs were unpersisted. Needed because GC-driven
    * ContextCleaner reclamation of dropped locally-checkpointed RDDs is
    * unreliable (measured on Spark 4.1: once any LATER shuffle-bearing
    * query has run and its checkpointed frame is still live, a dropped
    * earlier checkpoint survives arbitrarily many System.gc() rounds;
    * dropping everything reclaims all — some shuffle-execution-side
    * structure transitively retains it). Explicit release is
    * deterministic regardless. */
  def unpersistCheckpoint(df: Dataset[_]): Int = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: execution.LogicalRDD => lr.rdd
    }
    rdds.foreach(_.unpersist(blocking = false))
    rdds.size
  }

  /** Idempotently add a planner strategy to this session (the public
    * `experimental.extraStrategies` hook; prepended to the planner). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
