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

  /** DataFrame from a custom LogicalPlan (runs the full analyzer), and
    * the analyzed plan of a DataFrame — the two directions a library
    * shipping custom logical operators needs. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** EAGER Column -> catalyst Expression: `toExpression` returns a
    * lazy ColumnNodeExpression wrapper that custom logical operators
    * never get converted out of (it survives into the physical plan
    * and fails task serialization); this converts the column node to
    * a plain (possibly unresolved) catalyst expression up front. */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
