package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made `Column` implementation-agnostic; the Column↔Expression
  * bridge (`classic.ExpressionUtils`) is private[sql]. This shim exposes
  * exactly that bridge to graft's custom expressions — the standard
  * pattern for third-party Catalyst expression libraries.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a (resolved) LogicalPlan — the entry point a
    * custom logical operator needs (`classic.Dataset.ofRows` is
    * private[sql], same situation as the Column bridge above).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
