package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable SpaceSaving summary: item → [estimated count, overestimation
  * error], at most k entries, plus the total stream length seen. */
final class SpaceSavingBuffer {
  val m = new java.util.HashMap[Long, Array[Long]]()
  var n: Long = 0L
}

/** `space_saving_topk(item, k)` — the Metwally et al. SpaceSaving sketch
  * (ICDT 2005) as a map-side-combinable aggregate: a bounded k-counter
  * summary of a Long item stream with the classic guarantees
  *
  *   - any item with true frequency > n/k is present in the summary;
  *   - for a present item, true ≤ count ≤ true + error.
  *
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * absent items are charged the other summary's minimum counter (its
  * worst-case undercount) when both summaries are full, preserving both
  * guarantees, then the union is re-truncated to the k largest.
  *
  * Why a TypedImperativeAggregate: the buffer is an O(k) JVM map living
  * in ObjectHashAggregateExec with map-side partial aggregation — each
  * partition condenses its slice to k counters and only those merge,
  * which is the whole point at 100 TB: the exact per-key count it
  * replaces shuffles |distinct keys| rows, the sketch shuffles k per
  * partition regardless of cardinality. The production pattern is
  * sketch → exact recount of the k candidates (a broadcast semi-join) —
  * the superset guarantee makes the recount complete, and that two-phase
  * result is EXACT, hence oracle-able (q98).
  *
  * Output: array<struct<item, count, error>> ordered (count desc, item
  * asc). Eviction ties (several minima) pick the lowest item id so the
  * summary is deterministic for a given input ORDER; q98 only relies on
  * the order-independent superset guarantee, not on summary equality.
  */
case class SpaceSavingTopK(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {
  require(k >= 1, s"space_saving_topk: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer

  /** The (count, item) minimum entry — the eviction victim. O(k) scan;
    * k is small by contract (the sketch exists to BE small). */
  private def minEntry(b: SpaceSavingBuffer): (Long, Array[Long]) = {
    var mk = 0L; var mv: Array[Long] = null
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (mv == null || e.getValue()(0) < mv(0) ||
          (e.getValue()(0) == mv(0) && e.getKey < mk)) {
        mk = e.getKey; mv = e.getValue
      }
    }
    (mk, mv)
  }

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      b.n += 1
      val cur = b.m.get(item)
      if (cur != null) cur(0) += 1
      else if (b.m.size < k) b.m.put(item, Array(1L, 0L))
      else {
        val (mk, mv) = minEntry(b)
        b.m.remove(mk)
        b.m.put(item, Array(mv(0) + 1, mv(0)))
      }
    }
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (o.m.isEmpty && o.n == 0) return b
    // a summary's min counter bounds how much it may have undercounted an
    // absent item — but only once it is full (before that, absent = 0)
    def minCount(x: SpaceSavingBuffer): Long =
      if (x.m.size < k) 0L else minEntry(x)._2(0)
    val mb = minCount(b)
    val mo = minCount(o)
    val union = new java.util.HashMap[Long, Array[Long]]()
    b.m.forEach { (item, cv) =>
      val ov = o.m.get(item)
      if (ov != null) union.put(item, Array(cv(0) + ov(0), cv(1) + ov(1)))
      else union.put(item, Array(cv(0) + mo, cv(1) + mo))
    }
    o.m.forEach { (item, ov) =>
      if (!b.m.containsKey(item))
        union.put(item, Array(ov(0) + mb, ov(1) + mb))
    }
    // keep the k largest by (count desc, item asc)
    val entries = new java.util.ArrayList(union.entrySet())
    entries.sort { (x, y) =>
      val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
      if (c != 0) c else java.lang.Long.compare(x.getKey, y.getKey)
    }
    b.m.clear()
    var i = 0
    while (i < entries.size() && i < k) {
      b.m.put(entries.get(i).getKey, entries.get(i).getValue)
      i += 1
    }
    b.n += o.n
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val entries = new java.util.ArrayList(b.m.entrySet())
    entries.sort { (x, y) =>
      val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
      if (c != 0) c else java.lang.Long.compare(x.getKey, y.getKey)
    }
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = InternalRow(e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.m.size)
    b.m.forEach { (item, cv) =>
      out.writeLong(item); out.writeLong(cv(0)); out.writeLong(cv(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer
    b.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      b.m.put(in.readLong(), Array(in.readLong(), in.readLong()))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = c(0))
  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(item), k).toAggregateExpression())
}
