package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ↔ Expression conversion `private[sql]`
  * (ExpressionUtils). This bridge lives under org.apache.spark.sql so
  * graft's custom Catalyst expressions can be exposed as Columns —
  * the same access path Spark's own function registry uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
