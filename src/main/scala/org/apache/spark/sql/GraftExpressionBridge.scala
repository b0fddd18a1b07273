package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` constructor; the supported
  * wrapper `classic.ExpressionUtils` is `private[sql]`. This bridge —
  * compiled into the `org.apache.spark.sql` package, the conventional
  * extension-library escape hatch — re-exports just the two conversions
  * graft's custom Catalyst expressions need.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
