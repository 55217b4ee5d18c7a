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

  /** Eager ColumnNode→Expression conversion. `expression` wraps the node in
    * a lazy `ColumnNodeExpression` whose dataType reads NullType until the
    * plan binds it — fine inside DataFrame transformations, but an
    * `injectFunction` builder must hand the analyzer a real expression tree
    * (the surrounding query resolves field extraction against its dataType
    * immediately). */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
