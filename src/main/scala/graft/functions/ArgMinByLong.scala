package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable state: best (long, long) ordering seen and its payload. */
final class ArgMinLongBuffer {
  var set: Boolean = false
  var d: Long = 0L
  var t: Long = 0L
  var p: Any = null
}

/** `arg_min_by_l(payload, ord_long, ord_tiebreak)` — [[ArgMinBy]]'s
  * EXACT-INTEGER sibling: the payload of the row minimizing (or, with
  * `max = true`, maximizing) the `(long, long)` ordering pair
  * lexicographically.
  *
  * Why it exists: [[ArgMinBy]]'s ordering buffer is a Double, which is
  * exact only below 2^53 — fine for epoch-micros and distances, wrong for
  * the exact-integer devices (q359's n-scaled deviation |c·n − S| can
  * exceed 2^53 at extreme row counts, and its scaladoc promises
  * exactness). Before this class, those argmins had to stay on builtin
  * min_by/max_by(struct), whose immutable struct buffer degrades the whole
  * corpus aggregation to SortAggregate. Same O(1) buffer, same
  * ObjectHashAggregate + map-side partials; rows with a null ordering
  * field are skipped (callers guarantee non-null orderings).
  */
case class ArgMinByLong(payload: Expression, ordD: Expression, ordT: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0,
                        max: Boolean = false)
    extends TypedImperativeAggregate[ArgMinLongBuffer] {

  override def children: Seq[Expression] = Seq(payload, ordD, ordT)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  override def createAggregationBuffer(): ArgMinLongBuffer = new ArgMinLongBuffer

  private def better(b: ArgMinLongBuffer, d: Long, t: Long): Boolean = {
    if (!b.set) return true
    if (d != b.d) { if (max) d > b.d else d < b.d }
    else { if (max) t > b.t else t < b.t }
  }

  override def update(b: ArgMinLongBuffer, input: InternalRow): ArgMinLongBuffer = {
    val dAny = ordD.eval(input)
    val tAny = ordT.eval(input)
    if (dAny != null && tAny != null) {
      val d = dAny.asInstanceOf[Long]
      val t = tAny.asInstanceOf[Long]
      if (better(b, d, t)) {
        b.set = true; b.d = d; b.t = t
        b.p = InternalRow.copyValue(payload.eval(input))
      }
    }
    b
  }

  override def merge(b: ArgMinLongBuffer, o: ArgMinLongBuffer): ArgMinLongBuffer = {
    if (o.set && better(b, o.d, o.t)) {
      b.set = true; b.d = o.d; b.t = o.t; b.p = o.p
    }
    b
  }

  override def eval(b: ArgMinLongBuffer): Any = if (b.set) b.p else null

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](BooleanType, LongType, LongType, dataType))
  @transient private lazy val rowBuf = new Array[Any](4)

  override def serialize(b: ArgMinLongBuffer): Array[Byte] = {
    rowBuf(0) = b.set; rowBuf(1) = b.d; rowBuf(2) = b.t; rowBuf(3) = b.p
    proj(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rowBuf))
      .getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArgMinLongBuffer = {
    val row = new UnsafeRow(4)
    row.pointTo(bytes, bytes.length)
    val b = new ArgMinLongBuffer
    b.set = row.getBoolean(0)
    b.d = row.getLong(1)
    b.t = row.getLong(2)
    b.p = if (row.isNullAt(3)) null else InternalRow.copyValue(row.get(3, dataType))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgMinByLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMinByLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgMinByLong =
    copy(payload = c(0), ordD = c(1), ordT = c(2))
  override def prettyName: String = if (max) "arg_max_by_l" else "arg_min_by_l"
}

object ArgMinByLong {
  import org.apache.spark.sql.catalyst.expressions.Cast

  private def coerceL(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  def apply(payload: Column, ordLong: Column, ordTie: Column): Column =
    ColumnBridge.column(ArgMinByLong(
      ColumnBridge.expression(payload),
      coerceL(ColumnBridge.expression(ordLong)),
      coerceL(ColumnBridge.expression(ordTie))).toAggregateExpression())

  def argMax(payload: Column, ordLong: Column, ordTie: Column): Column =
    ColumnBridge.column(ArgMinByLong(
      ColumnBridge.expression(payload),
      coerceL(ColumnBridge.expression(ordLong)),
      coerceL(ColumnBridge.expression(ordTie)),
      max = true).toAggregateExpression())
}
