package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Tail-probability p-values as codegen'd Catalyst expressions over
  * [[graft.stats.SpecialFunctions]] — the p-value columns R prints from
  * `chisq.test` / `summary(aov(...))` (`R_groupe4.R:838,874,884`), computed
  * inside the lazy plan over the (tiny) statistic aggregates. Custom
  * Expression, not a UDF, per the preference order in SURVEY.md §4;
  * `doGenCode` delegates to the static scalar helpers so the expressions
  * stay inside whole-stage codegen. */
case class ChiSquarePValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"chi2_pvalue requires (double, double), got ${children.map(_.dataType)}")
  }

  override protected def nullSafeEval(stat: Any, dof: Any): Any =
    graft.stats.SpecialFunctions.chiSquarePValue(
      stat.asInstanceOf[Double], dof.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, d) =>
      s"graft.stats.SpecialFunctions.chiSquarePValue($s, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChiSquarePValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "chi2_pvalue"
}

/** Upper-tail F-distribution p-value P[F(d1, d2) ≥ f]. */
case class FPValue(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"f_pvalue requires (double, double, double), got ${children.map(_.dataType)}")
  }

  override protected def nullSafeEval(f: Any, d1: Any, d2: Any): Any =
    graft.stats.SpecialFunctions.fPValue(
      f.asInstanceOf[Double], d1.asInstanceOf[Double], d2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, d1, d2) =>
      s"graft.stats.SpecialFunctions.fPValue($f, $d1, $d2)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FPValue =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "f_pvalue"
}

object PValue {
  /** χ² upper-tail p-value column. */
  def chiSquare(stat: Column, dof: Column): Column =
    ColumnBridge.column(ChiSquarePValue(
      ColumnBridge.expression(stat.cast("double")),
      ColumnBridge.expression(dof.cast("double"))))

  /** F upper-tail p-value column. */
  def f(fStat: Column, d1: Column, d2: Column): Column =
    ColumnBridge.column(FPValue(
      ColumnBridge.expression(fStat.cast("double")),
      ColumnBridge.expression(d1.cast("double")),
      ColumnBridge.expression(d2.cast("double"))))
}
