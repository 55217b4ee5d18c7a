package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable aggregation state: best (dist, tie) seen and its payload. */
final class ArgMinBuffer {
  var set: Boolean = false
  var d: Double = 0.0
  var t: Long = 0L
  var p: Any = null
}

/** `arg_min_by(payload, ord_double, ord_tiebreak)` — the payload of the row
  * minimizing `(ord_double, ord_tiebreak)` lexicographically.
  *
  * Why not builtin `min_by(payload, struct(d, t))`: MinBy is a
  * DeclarativeAggregate whose buffer holds the struct ordering key, and
  * struct buffers are immutable types HashAggregateExec can't hold — the
  * plan silently degrades to SortAggregate, which SORTS the entire input
  * (for a KNN cross join, every candidate pair) before aggregating. This
  * TypedImperativeAggregate keeps an O(1) JVM buffer and runs in
  * ObjectHashAggregateExec with map-side partial aggregation: the pair
  * stream collapses per partition and only |groups| buffers shuffle.
  *
  * The tiebreak must make the (d, t) order total for deterministic results
  * (pass a unique id).
  *
  * `max = true` flips every comparison, giving `arg_max_by` under the SAME
  * struct total order builtin MaxBy uses (NaN sorts greatest, so a max
  * PREFERS a NaN ordering value — mirrored in [[better]]).
  */
case class ArgMinBy(payload: Expression, ordD: Expression, ordT: Expression,
                    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0,
                    max: Boolean = false)
    extends TypedImperativeAggregate[ArgMinBuffer] {

  override def children: Seq[Expression] = Seq(payload, ordD, ordT)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  override def createAggregationBuffer(): ArgMinBuffer = new ArgMinBuffer

  /** (d, t) strictly before (b.d, b.t) — or strictly after when `max` —
    * under the same total order Spark uses for struct aggregation keys:
    * NaN sorts greatest (so min avoids NaN, max prefers it); equal doubles
    * (incl. NaN==NaN) fall through to the tiebreak. */
  private def better(b: ArgMinBuffer, d: Double, t: Long): Boolean = {
    if (!b.set) return true
    val dNaN = java.lang.Double.isNaN(d)
    val bNaN = java.lang.Double.isNaN(b.d)
    if (dNaN != bNaN) { if (max) dNaN else bNaN }
    else if (!dNaN && d != b.d) { if (max) d > b.d else d < b.d }
    else { if (max) t > b.t else t < b.t }
  }

  override def update(b: ArgMinBuffer, input: InternalRow): ArgMinBuffer = {
    val dAny = ordD.eval(input)
    val tAny = ordT.eval(input)
    if (dAny != null && tAny != null) {
      val d = dAny.asInstanceOf[Double]
      val t = tAny.asInstanceOf[Long]
      if (better(b, d, t)) {
        b.set = true; b.d = d; b.t = t
        b.p = InternalRow.copyValue(payload.eval(input))
      }
    }
    b
  }

  override def merge(b: ArgMinBuffer, o: ArgMinBuffer): ArgMinBuffer = {
    if (o.set && better(b, o.d, o.t)) {
      b.set = true; b.d = o.d; b.t = o.t; b.p = o.p
    }
    b
  }

  override def eval(b: ArgMinBuffer): Any = if (b.set) b.p else null

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](BooleanType, DoubleType, LongType, dataType))
  @transient private lazy val rowBuf = new Array[Any](4)

  override def serialize(b: ArgMinBuffer): Array[Byte] = {
    rowBuf(0) = b.set; rowBuf(1) = b.d; rowBuf(2) = b.t; rowBuf(3) = b.p
    proj(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rowBuf))
      .getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArgMinBuffer = {
    val row = new UnsafeRow(4)
    row.pointTo(bytes, bytes.length)
    val b = new ArgMinBuffer
    b.set = row.getBoolean(0)
    b.d = row.getDouble(1)
    b.t = row.getLong(2)
    b.p = if (row.isNullAt(3)) null else InternalRow.copyValue(row.get(3, dataType))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgMinBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMinBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgMinBy =
    copy(payload = c(0), ordD = c(1), ordT = c(2))
  override def prettyName: String = if (max) "arg_max_by" else "arg_min_by"
}

object ArgMinBy {
  import org.apache.spark.sql.catalyst.expressions.Cast

  /** Coerce ordering children to the buffer's primitive types (SQL numeric
    * literals arrive as Decimal). */
  def coerced(payload: Expression, ordD: Expression, ordT: Expression,
              max: Boolean = false): ArgMinBy =
    ArgMinBy(
      payload,
      if (ordD.dataType == DoubleType) ordD else Cast(ordD, DoubleType),
      if (ordT.dataType == LongType) ordT else Cast(ordT, LongType),
      max = max)

  def apply(payload: Column, ordDouble: Column, ordTie: Column): Column =
    ColumnBridge.column(
      coerced(ColumnBridge.expression(payload), ColumnBridge.expression(ordDouble),
        ColumnBridge.expression(ordTie)).toAggregateExpression())

  /** `arg_max_by(payload, d, t)` — same buffer, flipped comparisons. */
  def argMax(payload: Column, ordDouble: Column, ordTie: Column): Column =
    ColumnBridge.column(
      coerced(ColumnBridge.expression(payload), ColumnBridge.expression(ordDouble),
        ColumnBridge.expression(ordTie), max = true).toAggregateExpression())
}
