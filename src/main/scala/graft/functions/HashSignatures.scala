package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the content-signature hot paths.
  *
  * The pure-HOF formulations (aggregate/zip_with/transform chains) are
  * correct but evaluate one Catalyst expression tree node per token per
  * bit — ~10s for 5k docs. These expressions do the same math in a tight
  * JVM loop over the token array (XXH64 over the UTF8 bytes directly, no
  * intermediate allocation), which is the difference between "demo" and
  * "100 TB corpus" throughput. CodegenFallback is fine here: the loop IS
  * the work; there is no expression-tree overhead left to eliminate.
  */

/** 64-bit SimHash of an array<string> token column: each token's xxhash64
  * votes ±1 per bit position; the sign vector is the fingerprint
  * (Charikar 2002). Seed 42 matches Spark's builtin xxhash64, so results
  * equal the HOF formulation bit-for-bit. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}

/** MinHash signature of an array<string> token column: k-token shingles
  * (space-joined), hashed with `numHashes` seeded XXH64 functions; the
  * signature is the per-seed minimum. Documents shorter than k yield one
  * whole-document shingle so no row is left signatureless. */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - k + 1, 1)
    val space = UTF8String.fromString(" ")
    var sh = 0
    while (sh < nShingles) {
      val end = math.min(sh + k, n)
      var shingle = if (sh < n) toks(sh) else UTF8String.EMPTY_UTF8
      var j = sh + 1
      while (j < end) {
        shingle = UTF8String.concat(shingle, space, toks(j))
        j += 1
      }
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashUnsafeBytes(
          shingle.getBaseObject, shingle.getBaseOffset, shingle.numBytes, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def apply(tokens: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k, numHashes))
}

/** xxhash64 (seed 42, matching Spark's builtin) of every k-token shingle of
  * an array<string> column — the tight-loop twin of the pure-HOF
  * `transform(sequence(...), i -> xxhash64(concat_ws(" ", slice(...))))`
  * formulation, bit-identical to it (same UTF8String concat, same XXH64
  * seed), but one JVM loop instead of an expression-tree eval per shingle.
  * Shared substrate of n-gram Jaccard (q34) and near-dup canonicalize
  * (q44); documents shorter than k yield one truncated shingle, exactly
  * like `slice`'s clamping. Null tokens are SKIPPED entirely (no
  * separator emitted), matching concat_ws's null handling, so the
  * bit-identity holds for null-containing token arrays too. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val nShingles = math.max(n - k + 1, 1)
    val out = new Array[Long](nShingles)
    val space = UTF8String.fromString(" ")
    var sh = 0
    while (sh < nShingles) {
      val end = math.min(sh + k, n)
      var shingle: UTF8String = null
      var j = sh
      while (j < end) {
        if (toks(j) != null)
          shingle = if (shingle == null) toks(j)
                    else UTF8String.concat(shingle, space, toks(j))
        j += 1
      }
      if (shingle == null) shingle = UTF8String.EMPTY_UTF8
      out(sh) = XXH64.hashUnsafeBytes(
        shingle.getBaseObject, shingle.getBaseOffset, shingle.numBytes, 42L)
      sh += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def apply(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))
}

/** |A ∩ B| of two ascending-sorted long arrays by a single merge scan —
  * no per-row hash-set allocation, unlike `size(array_intersect(a, b))`
  * which builds an OpenHashSet per call (~4 µs/row; the merge scan is
  * ~100 ns on 50-element sets). Inputs MUST be sorted ascending with
  * distinct elements (produce them with `array_sort(array_distinct(...))`);
  * the n-gram Jaccard verify step is the hot caller (millions of candidate
  * pairs per partition). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_size"
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
