package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression conversion. ExpressionUtils is
  * `private[sql]`, so this one-file subpackage of org.apache.spark.sql
  * re-exports the two conversions graft's native expressions need —
  * the standard pattern for third-party Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
