package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `match_count(a, b)` — positions where two long arrays agree
  * (Σ 1[a_i == b_i] over the shorter length).
  *
  * This is the MinHash Jaccard estimator's kernel: est = match_count(sigA,
  * sigB) / numHashes. The HOF spelling `aggregate(zip_with(a, b, =), 0, +)`
  * is CodegenFallback — an interpreted per-element lambda dispatch — and
  * after the r13 est-before-dedup reorder it runs once per BAND MATCH, so
  * the interpreter tax multiplies. This expression stays inside
  * whole-stage codegen: one fused int loop, no allocation (the zip_with
  * spelling also materializes the intermediate indicator array).
  *
  * Null semantics: null if either array is null (BinaryExpression
  * null-intolerant default); elements are non-null by construction
  * (MinHashSig declares containsNull = false).
  */
case class MatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"match_count expects two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MatchCount =
    copy(left = l, right = r)
  override def prettyName: String = "match_count"
}

object MatchCount {
  def apply(a: Column, b: Column): Column = ColumnBridge.column(
    MatchCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
