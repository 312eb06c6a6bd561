package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

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
}
