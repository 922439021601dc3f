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
}
