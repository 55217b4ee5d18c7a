package graft.rules

import graft.functions.{ArgMinBy, ArgMinByLong}
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: `min_by(payload, struct(d, t))` → `arg_min_by(payload,
  * d, t)` — and `max_by(payload, struct(d, t))` → its flipped twin — when
  * the ordering struct is a (numeric, integral) pair.
  *
  * Why: builtin MinBy is declarative and buffers the whole struct ordering
  * key; struct buffers can't live in HashAggregateExec's mutable row, so
  * the plan silently degrades to SortAggregate — which SORTS the entire
  * input before aggregating (for an argmin over a KNN pair stream, every
  * candidate pair). ArgMinBy keeps an O(1) typed buffer and runs in
  * ObjectHashAggregate with map-side partials. Ordering semantics match
  * (NaN greatest, tiebreak on the second field); MinBy's behavior on fully
  * duplicated (d, t) keys is already unspecified, which the rewrite
  * preserves.
  *
  * Null semantics: builtin MinBy compares the struct value itself, where a
  * null FIELD sorts smallest — a row with d=NULL can win; ArgMinBy skips
  * rows where d or t is null. The two only agree when neither ordering
  * field can be null, so the rewrite is guarded on
  * `ord.valExprs.forall(!_.nullable)` and plans with nullable ordering
  * fields keep the builtin (slower, but exactly SQL-semantic) MinBy.
  *
  * Injected via [[graft.GraftExtensions]] (`spark.sql.extensions`).
  */
object RewriteMinByStruct extends Rule[LogicalPlan] {
  // First ordering field eligible for the Double-buffer ArgMinBy. LongType
  // is deliberately EXCLUDED: distinct longs >= 2^53 collapse to equal
  // doubles and the comparison would fall through to the tiebreak,
  // silently picking a different winner than the builtin's exact struct
  // order. Long-first pairs go to ArgMinByLong below instead.
  private def numericDouble(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  private def integralLong(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def rewritable(ord: CreateNamedStruct): Boolean =
    ord.valExprs.size == 2 &&
      (numericDouble(ord.valExprs.head) || integralLong(ord.valExprs.head)) &&
      integralLong(ord.valExprs(1)) &&
      ord.valExprs.forall(!_.nullable)

  private def argBy(payload: Expression, ord: CreateNamedStruct,
                    max: Boolean): AggregateFunction = {
    val d = ord.valExprs.head
    val t = ord.valExprs(1)
    val tL = if (t.dataType == LongType) t else Cast(t, LongType)
    if (integralLong(d)) {
      // Both fields integral: exact (long, long) lexicographic order —
      // correct even above 2^53 where a Double buffer would lose bits.
      ArgMinByLong(payload, if (d.dataType == LongType) d else Cast(d, LongType), tL, max = max)
    } else {
      ArgMinBy(payload, if (d.dataType == DoubleType) d else Cast(d, DoubleType), tL, max = max)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ae @ AggregateExpression(MinBy(payload, ord: CreateNamedStruct), _, false, None, _)
        if rewritable(ord) =>
      ae.copy(aggregateFunction = argBy(payload, ord, max = false))
    case ae @ AggregateExpression(MaxBy(payload, ord: CreateNamedStruct), _, false, None, _)
        if rewritable(ord) =>
      ae.copy(aggregateFunction = argBy(payload, ord, max = true))
  }
}
