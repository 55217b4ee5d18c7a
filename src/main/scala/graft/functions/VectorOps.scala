package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Tight-loop twins of the HOF vector kernels in
  * [[graft.similarity.Similarity]].
  *
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)` is
  * correct but evaluates one expression-tree node per element per pair —
  * several µs per 64-dim candidate, which dominates the near-dup verify
  * stage (millions of candidates). These run the SAME IEEE sequence — a
  * sequential left fold in element order, no reassociation, no FMA — so
  * results are bit-identical to the HOF forms (DuckDB-oracle parity
  * depends on this); they are just one JVM loop per row.
  */

/** Σ a(i)·b(i) as a left fold. Null if either array is null, lengths
  * differ, or any element is null — exactly the HOF behavior (zip_with
  * pads/propagates null into the fold).
  *
  * Codegen'd (r14): this kernel sits in the per-PAIR hot loops — the
  * brute-force cosine rankers (q27/q224, millions of pairs), SemDedup's
  * within-cell verify, the near-dup stage-2 verifies — where the old
  * CodegenFallback path paid an interpreted dispatch + a boxed Double per
  * call. The generated loop runs the SAME index-order sequential fold, so
  * values stay bit-identical (DuckDB-oracle parity). */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product_d"
}

object DotProductD {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** √(Σ x²) as a left fold — the L2 norm, bit-identical to
  * `sqrt(aggregate(a, 0.0, (acc,x) => acc + x*x))`. Codegen'd (r14,
  * same rationale and same-fold guarantee as [[DotProductD]]). */
case class NormD(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $a.getDouble($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormD =
    copy(child = newChild)
  override def prettyName: String = "norm_d"
}

object NormD {
  def apply(a: Column): Column =
    ColumnBridge.column(NormD(ColumnBridge.expression(a)))
}

/** Int8 sketch of the UNIT vector v/n: byte i = rint(v(i)/n · 127), as a
  * `binary(dim)` — 64 bytes for a 64-dim vector vs ~512 for the double
  * array, which is the whole point: the near-dup candidate join shuffles
  * one sketch per candidate row, so this cuts that stage's shuffle volume
  * ~7× (measured in BASELINE.md's byte audit). Rounding to nearest keeps
  * every coordinate within 1/254 of the true unit coordinate, which gives
  * the PROVABLE cosine error bound used by [[DotProductI8]] callers:
  * |cos(a,b) − qdot/127²| ≤ (2√d + d/254)/254 (≈0.064 at d=64; see
  * `Similarity.quantBound`). Null if the array is null, any element is
  * null, or n is not a positive finite number. Codes are CLAMPED to
  * [−127, 127]: with a correct norm the clamp never fires (|vᵢ/n| ≤ 1),
  * but a caller-supplied n smaller than the true norm would otherwise
  * push rint past 127 and the byte cast would silently WRAP to a negative
  * code, corrupting every downstream sketch dot — clamping keeps the
  * sketch merely saturated, so the quantBound contract degrades gracefully
  * instead of inverting coordinates. */
case class QuantizeUnitI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val n = r.asInstanceOf[Double]
    if (!(n > 0.0) || n.isInfinite) return null
    val d = a.numElements()
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      out(i) = math.max(-127.0, math.min(127.0,
        math.rint(a.getDouble(i) / n * 127.0))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if (!($n > 0.0) || java.lang.Double.isInfinite($n)) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = $a.numElements();
         |  byte[] $out = new byte[$d];
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(
         |      127.0, java.lang.Math.rint($a.getDouble($i) / $n * 127.0)));
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeUnitI8 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "quantize_unit_i8"
}

object QuantizeUnitI8 {
  def apply(v: Column, n: Column): Column =
    ColumnBridge.column(
      QuantizeUnitI8(ColumnBridge.expression(v), ColumnBridge.expression(n)))
}

/** Σ a(i)·b(i) over two int8 sketches (binary columns) as an Int —
  * exact integer arithmetic (max |Σ| ≤ d·127² < 2³¹ for d < 133k).
  * Null if either side is null or lengths differ. */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    var acc = 0
    var i = 0
    while (i < a.length) {
      acc += a(i) * b(i)
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }

  // codegen'd: this is the per-CANDIDATE kernel of the two-stage near-dup
  // prefilter — at sf10 it runs ~10^10 times, so the interpreted dispatch
  // + boxed Integer of CodegenFallback is exactly the tax to avoid
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += $a[$i] * $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product_i8"
}

object DotProductI8 {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
