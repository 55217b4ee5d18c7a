package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable buffer: the extreme string seen so far (null = none yet). */
final class ExtremeStringBuffer {
  var s: UTF8String = null
}

/** `min_str(s)` / `max_str(s)` — lexicographic (binary-collation) string
  * extreme as a TypedImperativeAggregate.
  *
  * Why not builtin min/max: their DeclarativeAggregate buffer holds the
  * string itself, and variable-length types can't live in
  * HashAggregateExec's mutable row — the whole aggregation (and every
  * OTHER function sharing it) silently degrades to SortAggregate, which
  * sorts the input stream. For a corpus-scale column profiler (q261's
  * ANALYZE shape) that sort IS the cost. This aggregate keeps one
  * UTF8String per buffer and runs in ObjectHashAggregateExec with
  * map-side partials. Comparison is UTF8String.compareTo — byte-wise,
  * identical to Spark's binary string ordering — so results match the
  * builtins exactly; nulls are ignored (SQL aggregate semantics), and an
  * all-null input yields null.
  */
case class ExtremeString(child: Expression, max: Boolean,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExtremeStringBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): ExtremeStringBuffer =
    new ExtremeStringBuffer

  private def better(b: ExtremeStringBuffer, v: UTF8String): Boolean =
    b.s == null || (if (max) v.compareTo(b.s) > 0 else v.compareTo(b.s) < 0)

  override def update(b: ExtremeStringBuffer, input: InternalRow): ExtremeStringBuffer = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    // clone: the input row's backing bytes are reused by the scanner
    if (v != null && better(b, v)) b.s = v.clone()
    b
  }

  override def merge(b: ExtremeStringBuffer, o: ExtremeStringBuffer): ExtremeStringBuffer = {
    if (o.s != null && better(b, o.s)) b.s = o.s
    b
  }

  override def eval(b: ExtremeStringBuffer): Any = b.s

  // 1 flag byte + the string's bytes: an empty string and "none yet"
  // must serialize differently.
  override def serialize(b: ExtremeStringBuffer): Array[Byte] =
    if (b.s == null) Array[Byte](0)
    else {
      val sb = b.s.getBytes
      val out = new Array[Byte](sb.length + 1)
      out(0) = 1
      System.arraycopy(sb, 0, out, 1, sb.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): ExtremeStringBuffer = {
    val b = new ExtremeStringBuffer
    if (bytes.nonEmpty && bytes(0) == 1)
      b.s = UTF8String.fromBytes(bytes, 1, bytes.length - 1)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ExtremeString =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExtremeString =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ExtremeString =
    copy(child = c(0))
  override def prettyName: String = if (max) "max_str" else "min_str"
}

object ExtremeString {
  def minStr(c: Column): Column = ColumnBridge.column(
    ExtremeString(ColumnBridge.expression(c), max = false).toAggregateExpression())
  def maxStr(c: Column): Column = ColumnBridge.column(
    ExtremeString(ColumnBridge.expression(c), max = true).toAggregateExpression())
}
