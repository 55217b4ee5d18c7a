package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile over a single-space-separated document: token
  * count, distinct-token count, n-gram count, distinct-n-gram count — the
  * exact integer inputs of the Gopher-style rule set (q173) and the
  * repetition signal (q89).
  *
  * The pure-HOF formulation needs four passes over the document (two
  * `split`s, a per-gram `transform`/`slice`/`array_join` chain, and two
  * `array_distinct` OpenHashSets built through the expression interpreter).
  * This expression does the same counting in ONE scan of the UTF8 bytes
  * plus two JVM hash sets. Identity is exact string equality (no hashing),
  * so the counts — and any oracle replaying them with `list_distinct` —
  * match bit-for-bit; TextProfileSpec pins the equivalence against the HOF
  * formulation. CodegenFallback per the house rule (HashSignatures.scala):
  * the loop IS the work.
  *
  * Token boundaries replicate `split(text, " ")`: every single space is a
  * separator and empty tokens count (so `n_tokens` equals the
  * length-difference formula `length(t) - length(replace(t,' ','')) + 1`
  * on any input, not just the corpus convention). The i-th n-gram is the
  * raw substring from token i's start to token i+n-1's end, which equals
  * `array_join(slice(tokens, i, n), " ")` because the separator is the
  * single space. Grams exist only when the document has ≥ n tokens
  * (`Text.ngramStrings` semantics, not ShingleHashes' max(...,1) floor).
  */
case class TextProfile(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val nBytes = s.numBytes
    // Token spans: a space BYTE is a separator in every UTF-8 position it
    // can appear (0x20 never occurs inside a multi-byte sequence).
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var tokStart = 0
    var i = 0
    while (i <= nBytes) {
      val atSep = i == nBytes || s.getByte(i) == 0x20
      if (atSep) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = tokStart
        ends(nTok) = i
        nTok += 1
        tokStart = i + 1
      }
      i += 1
    }
    // (substring copies are unavoidable for set identity; one small byte[]
    // per token/gram, same order of allocation as the HOF form's one
    // UTF8String per gram — the savings are the three extra passes and the
    // per-gram expression-tree evaluation, not the copies)
    val distinctToks = new java.util.HashSet[UTF8String](nTok * 2)
    var t = 0
    while (t < nTok) {
      distinctToks.add(subBytes(s, starts(t), ends(t)))
      t += 1
    }
    val nGrams = math.max(nTok - n + 1, 0)
    val distinctGrams = new java.util.HashSet[UTF8String](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      distinctGrams.add(subBytes(s, starts(g), ends(g + n - 1)))
      g += 1
    }
    InternalRow(nTok.toLong, distinctToks.size.toLong,
      nGrams.toLong, distinctGrams.size.toLong)
  }

  private def subBytes(s: UTF8String, from: Int, until: Int): UTF8String = {
    val bytes = new Array[Byte](until - from)
    org.apache.spark.unsafe.Platform.copyMemory(
      s.getBaseObject, s.getBaseOffset + from,
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, until - from)
    UTF8String.fromBytes(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
  override def prettyName: String = "text_profile"
}

object TextProfile {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(text), n))
}
