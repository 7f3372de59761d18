package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters, so graft can
  * wrap custom Catalyst expressions (e.g. graft.plans.MinhashBands) as
  * ordinary Columns. Standard extension-library technique.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
