package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column<->Expression converters, so
  * graft's custom Catalyst expressions (e.g. graft.functions.
  * DotProduct) can be exposed as ordinary Columns. This is the
  * standard extension-point technique for libraries shipping native
  * expressions on Spark 4. */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
