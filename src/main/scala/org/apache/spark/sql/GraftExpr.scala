package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — lets
  * graft construct Columns over custom Catalyst expressions whose
  * parameters (piece maps, cost tables) are native Scala objects, with no
  * SQL-literal round-trip (a double cost rendered to SQL text and
  * re-parsed is an avoidable exactness hazard; a Scala Map isn't). */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
