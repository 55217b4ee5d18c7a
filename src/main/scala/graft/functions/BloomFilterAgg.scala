package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** `bloom_build(key, numWords, numHashes)` — a Bloom-filter bitset over a
  * Long key stream, as a map-side-combinable aggregate: each partition
  * condenses its keys into an m-bit set (m = 64·numWords), partials merge
  * by bitwise OR (trivially associative/commutative), and the result is a
  * plain `array<bigint>` of the words.
  *
  * This is the build side of the runtime-filter / semi-join-pushdown
  * pattern (what Spark's own AQE InjectRuntimeFilter does internally,
  * here as a user-level operator): aggregate the SMALL side's join keys
  * into a few-KB bitset, broadcast it as a 1-row scalar, and pre-filter
  * the 100 TB fact side MAP-SIDE — before the shuffle — keeping only rows
  * that might match. False positives are removed by the exact join that
  * follows, so the pre-filter never changes semantics; it only cuts the
  * shuffled volume to ~|matching| + ε·|fact|.
  *
  * Probe parity contract: membership is tested with column-expression
  * arithmetic (see [[BloomFilterAgg.mightContain]]) built from the SAME
  * double-hashing scheme used here — g_i = h1 + i·h2 with h1/h2 the two
  * halves of Murmur3 x86-32 over the key's 8 little-endian bytes at seeds
  * 42 and 0x9747b28c (Kirsch–Mitzenmacher double hashing: k independent
  * probes from two base hashes). Both sides run the identical JVM hash,
  * so there are NO false negatives by construction.
  *
  * Buffer: a primitive Array[Long] (numWords ≤ 1<<16 by require) — no
  * boxing, O(m) merge, ObjectHashAggregate-resident like the other
  * imperative aggregates in this package. */
final class BloomBuffer(val words: Array[Long])

case class BloomFilterAgg(child: Expression, numWords: Int, numHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] {
  require(numWords >= 1 && numWords <= (1 << 16),
    s"bloom_build: numWords in [1, 65536], got $numWords")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_build: numHashes in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(new Array[Long](numWords))

  override def update(b: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val m = numWords.toLong * 64L
      val h1 = BloomFilterAgg.hash(key, BloomFilterAgg.Seed1)
      val h2 = BloomFilterAgg.hash(key, BloomFilterAgg.Seed2)
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
        b.words((bit >>> 6).toInt) |= (1L << (bit & 63L))
        i += 1
      }
    }
    b
  }

  override def merge(b: BloomBuffer, o: BloomBuffer): BloomBuffer = {
    var i = 0
    while (i < numWords) { b.words(i) |= o.words(i); i += 1 }
    b
  }

  override def eval(b: BloomBuffer): Any =
    new GenericArrayData(b.words.map(w => w: Any))

  override def serialize(b: BloomBuffer): Array[Byte] = {
    val bytes = new Array[Byte](numWords * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < numWords) { bb.putLong(b.words(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val w = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { w(i) = bb.getLong(); i += 1 }
    new BloomBuffer(w)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = c(0))
  override def prettyName: String = "bloom_build"
}

object BloomFilterAgg {
  // 32-bit Murmur3 at two fixed seeds; widened to Long so the
  // Kirsch–Mitzenmacher combination h1 + i·h2 never collides mod m the
  // way a same-seed pair would.
  private[functions] val Seed1 = 42
  private[functions] val Seed2 = 0x9747b28c

  /** Murmur3 x86-32 of the key's 8 bytes — the same primitive Spark's
    * `hash()` SQL function uses for LongType, at an explicit seed, so the
    * column-side probe can reproduce it with built-in expressions. */
  private[functions] def hash(key: Long, seed: Int): Long =
    Murmur3_x86_32.hashLong(key, seed).toLong

  def apply(key: Column, numWords: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(key), numWords, numHashes)
        .toAggregateExpression())

  /** Membership probe as pure built-in column expressions (stays inside
    * whole-stage codegen — no UDF, no custom scalar expression needed):
    * replays the double-hash probe sequence against a bitset column.
    * `bloom` must be the `array<bigint>` produced by [[apply]] with the
    * SAME numWords/numHashes. */
  def mightContain(key: Column, bloom: Column,
                   numWords: Int, numHashes: Int): Column = {
    val m = numWords.toLong * 64L
    // Spark's hash(key, seed) for a LongType child is exactly
    // Murmur3_x86_32.hashLong(key, seed) — the probe parity contract.
    val h1 = hash32(key, Seed1).cast("long")
    val h2 = hash32(key, Seed2).cast("long")
    (0 until numHashes).map { i =>
      val bit = pmod(h1 + lit(i.toLong) * h2, lit(m))
      // bit < m ≤ 2^22, so the double division in floor() is exact
      val word = element_at(bloom, floor(bit / lit(64.0)).cast("int") + 1)
      (shiftRightVar(word, (bit % 64L).cast("int")) % 2 =!= 0)
        .as(s"__probe_$i")
    }.reduce(_ && _)
  }

  /** functions.shiftright only accepts a LITERAL shift; the probe's shift
    * is data-dependent, so build the catalyst node directly. */
  private def shiftRightVar(value: Column, shift: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRight(
        ColumnBridge.expression(value), ColumnBridge.expression(shift)))

  /** Spark's `hash(cols..., seed)` variant isn't in the public functions
    * API; build the Murmur3 expression directly. */
  private def hash32(key: Column, seed: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(ColumnBridge.expression(key)), seed))
}
