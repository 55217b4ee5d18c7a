package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ColumnNode-backed and gated the Expression bridge as
  * `private[sql]`; custom-Expression libraries conventionally host a thin
  * bridge inside the org.apache.spark.sql package tree to reach it. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
