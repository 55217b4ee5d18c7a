package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-reproducible hash family for the near-dup signatures.
  *
  * The XXH64-based signatures ([[MinHashSig]], [[SimHash64]]) are the raw
  * throughput path, but no external SQL engine can replay XXH64, so queries
  * built on them can only be verified rows-only. This family trades ~2× of
  * signature-computation speed for exact replayability:
  *
  *  - base hash = low 64 bits of MD5 (digest bytes 8..15, little-endian) —
  *    DuckDB computes the identical value as `md5_number_lower(s)`;
  *  - the k minhash functions are h_i(x) = (a_i·x + b_i) mod p with
  *    p = 2⁶¹−1 (Mersenne), the textbook universal family; any engine with
  *    128-bit integers replays it (`(a::HUGEINT * x + b) % p` in DuckDB);
  *  - the seeds a_i, b_i are themselves md5-derived from fixed strings, so
  *    there is no constant table to keep in sync across engines.
  *
  * Scale note: MD5 via JDK MessageDigest runs ~500 MB/s/core — signature
  * computation stays executor-CPU-bound and embarrassingly parallel, the
  * same 100 TB shape as the XXH64 path, only with a moderately larger
  * constant. Everything downstream (banding, bucket joins, verification)
  * is unchanged.
  */
object OracleHash {
  /** 2⁶¹ − 1, the Mersenne prime used by the affine minhash family. */
  val P61: Long = (1L << 61) - 1

  /** Low 64 bits of MD5(bytes): digest bytes 8..15 assembled little-endian
    * — bit-identical to DuckDB's `md5_number_lower`. */
  def md5Low64(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  def md5Low64(s: String): Long = md5Low64(s.getBytes(UTF_8))

  /** (a·b) mod p for a, b ∈ [0, p), p = 2⁶¹−1, without BigInteger: the
    * 122-bit product is folded with 2⁶¹ ≡ 1 (mod p). Exactness is
    * property-tested against BigInteger in OracleHashSpec. */
  def mulModP61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 so signed == unsigned high
    val lo = a * b
    // product = hi·2^64 + lo = q·2^61 + r; hi < 2^58 so (hi << 3) is exact
    val q = (hi << 3) | (lo >>> 61)
    val r = lo & P61
    var s = q + r // < 2^62
    s = (s >>> 61) + (s & P61)
    if (s >= P61) s - P61 else s
  }

  /** (x + y) mod p for x, y ∈ [0, p). */
  def addModP61(x: Long, y: Long): Long = {
    val s = x + y // < 2^62, no overflow
    if (s >= P61) s - P61 else s
  }

  /** Multiplier of the i-th affine hash: md5-derived, in [1, p). Mirrors
    * `(md5_number_lower('minhash_a_' || i) % (p-1)) + 1` (UBIGINT mod). */
  def seedA(i: Int): Long =
    java.lang.Long.remainderUnsigned(md5Low64("minhash_a_" + i), P61 - 1) + 1

  /** Offset of the i-th affine hash: md5-derived, in [0, p). */
  def seedB(i: Int): Long =
    java.lang.Long.remainderUnsigned(md5Low64("minhash_b_" + i), P61)
}

/** MinHash signature over the md5/mod-p family (oracle-replayable twin of
  * [[MinHashSig]]): k-token space-joined shingles, base = md5 low-64 of the
  * shingle reduced mod p, signature element i = min over shingles of
  * (a_i·base + b_i) mod p. Values lie in [0, 2⁶¹), so signed comparisons
  * agree with DuckDB's unsigned ones. Documents shorter than k yield one
  * clamped shingle (same as `t[i : i+k-1]` list slicing). */
case class MinHashSigP61(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val seedsA: Array[Long] = Array.tabulate(numHashes)(OracleHash.seedA)
  private lazy val seedsB: Array[Long] = Array.tabulate(numHashes)(OracleHash.seedB)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - k + 1, 1)
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
      val base = java.lang.Long.remainderUnsigned(OracleHash.md5Low64(shingle.getBytes), OracleHash.P61)
      var s = 0
      while (s < numHashes) {
        val h = OracleHash.addModP61(OracleHash.mulModP61(seedsA(s), base), seedsB(s))
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigP61 =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig_p61"
}

object MinHashSigP61 {
  def apply(tokens: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigP61(ColumnBridge.expression(tokens), k, numHashes))
}

/** 64-bit SimHash over md5 token hashes (oracle-replayable twin of
  * [[SimHash64]]): each token's md5-low-64 votes ±1 per bit; bit b of the
  * fingerprint is set iff the vote sum is strictly positive. DuckDB replays
  * it with `md5_number_lower`, `>>`, `&` and a list fold. */
case class SimHash64Md5(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = OracleHash.md5Low64(arr.getUTF8String(i).getBytes)
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

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)
  override def prettyName: String = "simhash64_md5"
}

object SimHash64Md5 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash64Md5(ColumnBridge.expression(tokens)))
}

/** Winnowing (MOSS, Schleimer/Wilkerson/Aiken SIGMOD'03) fingerprint over
  * the md5p61 shingle family: hash every k-token shingle (md5 low-64
  * reduced mod p = 2⁶¹−1, same base as [[MinHashSigP61]]), then keep the
  * minimum hash of each window of `w` consecutive shingle hashes, distinct,
  * in first-occurrence order. The guarantee: any match of length ≥ k+w−1
  * tokens between two documents shares at least one fingerprint, so a
  * postings equi-join on fingerprints has recall 1.0 for long matches at
  * ~2/(w+1) of the shingle-index size.
  *
  * One pass per document (shingle hashing and the sliding-window min fused
  * in a single JVM loop), mirroring the clamping of the pure-HOF
  * formulation `array_distinct(transform(sequence(0, greatest(nSh-w, 0)),
  * j -> array_min(slice(sh, j+1, w))))` over [[graft.text.Text]] shingles:
  * documents with fewer than w shingles yield one whole-array window.
  * Values lie in [0, 2⁶¹) so signed order agrees with DuckDB's unsigned
  * (the oracle replays the whole construction with `md5_number_lower` +
  * list lambdas). */
case class WinnowFingerprintP61(child: Expression, k: Int, w: Int)
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
    val hs = new Array[Long](nShingles)
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
      hs(sh) = java.lang.Long.remainderUnsigned(
        OracleHash.md5Low64(shingle.getBytes), OracleHash.P61)
      sh += 1
    }
    // window minima, deduped in first-occurrence order (values are ≥ 0 so
    // plain Long comparison is the unsigned order)
    val nWindows = math.max(nShingles - w + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nWindows)
    var j0 = 0
    while (j0 < nWindows) {
      val end = math.min(j0 + w, nShingles)
      var m = hs(j0)
      var j = j0 + 1
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      if (seen.add(m)) out += m
      j0 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintP61 =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint_p61"
}

object WinnowFingerprintP61 {
  def apply(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintP61(ColumnBridge.expression(tokens), k, w))
}
