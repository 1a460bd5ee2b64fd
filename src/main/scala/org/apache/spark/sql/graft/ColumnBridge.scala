package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's Column is a ColumnNode wrapper and the classic converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql], so
  * wrapping a custom `Expression` as a `Column` without a session-bound
  * SQL-function registration needs this one-liner inside the sql
  * package — the standard extension-library shim (the alternative,
  * `expr("fn(...)")`, only works for expressions registered on the
  * session and cannot take an arbitrary Column argument).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
