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
case class HyperplaneSig(child: Expression, nBits: Int, dim: Int, seed: Long = 42L,
                         family: String = "rng")
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  @transient private lazy val planes: Array[Array[Double]] = family match {
    case "rng" =>
      val rng = new scala.util.Random(seed)
      Array.fill(nBits, dim)(rng.nextDouble() * 2 - 1)
    case "md5sign" =>
      // Rademacher (±1) planes with md5-derived signs: plane p's entry for
      // dimension d is +1 iff bit d of md5_number_lower("hyperplane_" + p)
      // is set — replayable bit-for-bit by an external SQL oracle (see
      // OracleHashes.scala). ±1·v is exact in IEEE, so the projection is a
      // plain sequential fold of ±v_d, the same shape DuckDB's list_reduce
      // computes. Sign-LSH with Rademacher directions is the standard
      // cheap variant of Charikar's Gaussian construction.
      require(dim <= 64, s"md5sign planes carry 64 sign bits; dim=$dim > 64")
      Array.tabulate(nBits) { p =>
        val bits = OracleHash.md5Low64("hyperplane_" + p)
        Array.tabulate(dim)(d => if (((bits >>> d) & 1L) == 1L) 1.0 else -1.0)
      }
    case other => throw new IllegalArgumentException(s"unknown plane family: $other")
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
  def apply(vec: Column, nBits: Int, dim: Int, family: String): Column =
    ColumnBridge.column(
      HyperplaneSig(ColumnBridge.expression(vec), nBits, dim, family = family))
}
