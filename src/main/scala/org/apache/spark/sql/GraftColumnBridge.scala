package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression ⇄ Column converters.
  *
  * Spark 4 removed the public `Column(expr)` constructor; libraries
  * shipping custom Catalyst expressions either go through the function
  * registry (which requires an active, registered session at ANALYSIS
  * time) or bridge into the sql package — the established pattern for
  * Spark-native extension libraries. This is the only file in the repo
  * outside the `graft` namespace, and it touches nothing but the two
  * converters. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
