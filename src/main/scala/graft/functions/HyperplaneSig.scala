package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature of an array<double> vector: bit p =
  * sign(v · h_p), packed into an Int bucket id. Hyperplanes are derived
  * from a fixed seed so signatures are stable across runs, executors, and
  * cluster topologies.
  *
  * Tight-loop custom expression replacing an nBits×dim element_at
  * expression tree (512 Catalyst nodes per row at 8×64) with one array
  * read + fused dot products.
  */
case class HyperplaneSig(child: Expression, nBits: Int, dim: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  @transient private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextDouble() * 2 - 1)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var sig = 0
    var p = 0
    while (p < nBits) {
      val h = planes(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += arr.getDouble(d) * h(d)
        d += 1
      }
      if (proj > 0) sig |= (1 << p)
      p += 1
    }
    java.lang.Integer.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {
  def apply(vec: Column, nBits: Int, dim: Int): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(vec), nBits, dim))
}
