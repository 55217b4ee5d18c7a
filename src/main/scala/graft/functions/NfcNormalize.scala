package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of text-corpus
  * canonicalization: composed and decomposed spellings of the same
  * grapheme ("é" as U+00E9 vs "e"+U+0301) hash differently, so every
  * downstream exact/near dedup signature (md5, MinHash shingles, SimHash)
  * silently misses duplicates unless the corpus is normalized first.
  * Spark has no built-in for this; DuckDB ships `nfc_normalize`, which is
  * the oracle twin.
  *
  * Custom Catalyst `Expression` with `doGenCode` delegating to a static
  * helper over `java.text.Normalizer` (ICU-equivalent for NFC) — stays
  * inside whole-stage codegen, same pattern as [[TitleCase]]. The helper
  * short-circuits via `Normalizer.isNormalized`: real corpora are
  * overwhelmingly already NFC, so the common path is one scan and no
  * allocation.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Register as a SQL function (`SELECT nfc_normalize(x)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
}
