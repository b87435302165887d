package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column is backed by ColumnNodes (Connect-compatible API);
  * the classic Expression⇄Column converters are private[sql]. This
  * bridge re-exports just those two hooks for graft's native Catalyst
  * expressions (cf. Apache Spark columnNodeSupport.scala).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
