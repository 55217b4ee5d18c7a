package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `any_band_equal(a, b, r)` — true iff the two long arrays agree on ALL
  * `r` positions of at least one aligned r-wide band (band i spans
  * positions [i·r, i·r + r)).
  *
  * This is the LSH band-membership predicate evaluated directly on a pair
  * of MinHash signature arrays: a pair is a candidate under a
  * (bands, rowsPerBand = r) banding iff some band's slice matches exactly.
  * [[graft.dedup.Dedup.minHashLshSweep]] uses it to derive every coarser
  * banding's candidate set from the finest (r = 1) self-join, instead of
  * re-running signatures + self-join per config. The HOF spelling
  * (`exists(sequence(...), i -> slice(a) == slice(b))`) is
  * CodegenFallback with two array allocations per band probe; this stays
  * inside whole-stage codegen — one fused loop with early exit, no
  * allocation (the [[MatchCount]] precedent).
  *
  * Bands are the complete aligned r-blocks (⌊n/r⌋ over the shorter
  * length); a trailing partial block is not a band — identical to the
  * `slice(sig, band·r + 1, r)` band keys the per-config LSH join uses,
  * where every signature has the same full length by construction.
  *
  * Null semantics: null if either array is null (BinaryExpression
  * null-intolerant default); elements are non-null by construction
  * (MinHashSig declares containsNull = false).
  */
case class AnyBandEqual(left: Expression, right: Expression, rowsPerBand: Int)
    extends BinaryExpression {
  require(rowsPerBand >= 1, s"rowsPerBand must be >= 1: $rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"any_band_equal expects two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val bands = n / rowsPerBand
    var bi = 0
    while (bi < bands) {
      var j = 0
      var all = true
      while (all && j < rowsPerBand) {
        if (x.getLong(bi * rowsPerBand + j) != y.getLong(bi * rowsPerBand + j))
          all = false
        j += 1
      }
      if (all) return true
      bi += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val bands = ctx.freshName("bands")
      val bi = ctx.freshName("bi")
      val j = ctx.freshName("j")
      val all = ctx.freshName("all")
      val r = rowsPerBand
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $bands = $n / $r;
         |${ev.value} = false;
         |for (int $bi = 0; $bi < $bands && !${ev.value}; $bi++) {
         |  boolean $all = true;
         |  for (int $j = 0; $all && $j < $r; $j++) {
         |    if ($a.getLong($bi * $r + $j) != $b.getLong($bi * $r + $j)) $all = false;
         |  }
         |  if ($all) ${ev.value} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AnyBandEqual =
    copy(left = l, right = r)
  override def prettyName: String = "any_band_equal"
}

object AnyBandEqual {
  def apply(a: Column, b: Column, rowsPerBand: Int): Column = ColumnBridge.column(
    AnyBandEqual(ColumnBridge.expression(a), ColumnBridge.expression(b), rowsPerBand))
}
