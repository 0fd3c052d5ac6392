package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for sql-private Column↔Expression conversion (the
  * supported pattern for external Catalyst expression libraries: the
  * converters live in `org.apache.spark.sql.classic` as private[sql]).
  */
object GraftSqlShims {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  /** A DataFrame over an arbitrary analyzed subtree — lets the plan
    * lint measure properties (cardinalities) of a window's input. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
