package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column⇄Expression converters — the
  * supported way for third-party Catalyst expressions to surface as
  * `Column`s without registering a temp function per session (same
  * pattern Spark's own `functions` object uses internally). */
object shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
