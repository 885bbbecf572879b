package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between Catalyst [[Expression]]s and the public
  * [[Column]] API (Spark 4 hides the constructor behind private[sql]
  * ExpressionUtils; this subpackage is the sanctioned way for libraries
  * to reach it). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
