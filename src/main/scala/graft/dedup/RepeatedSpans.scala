package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-span detection — the Spark-shaped analogue of
  * suffix-array ExactSubstr dedup (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022): find, for every document, the
  * maximal token spans whose every k-gram also occurs in at least
  * `minDocs − 1` OTHER documents. Where ExactSubstr builds one giant
  * suffix array, the distributed form is positional k-gram postings: a
  * shared substring of ≥ k tokens shares all its k-grams, so marking
  * globally-duplicated k-gram start positions and merging consecutive
  * positions (the classic gaps-and-islands device) recovers the maximal
  * duplicated spans exactly, up to the k-token resolution floor.
  *
  * Scale shape: one explode to |corpus tokens| positional postings, one
  * per-gram distinct-doc count (equi-join-shaped agg on the gram — hot
  * boilerplate grams are exactly the rows that SHOULD collide), one
  * per-doc window for island grouping. No pairwise comparison anywhere —
  * unlike the LSH/PPJoin family this never materializes doc pairs, so its
  * cost is linear in corpus size at any duplication density. */
object RepeatedSpans {

  /** Per-document duplicated-span profile. Returns one row per input doc:
    * (idCol, n_dup_grams, n_spans, max_span_tokens, dup_frac) where
    * n_dup_grams counts k-gram start positions whose gram occurs in
    * ≥ `minDocs` distinct docs, n_spans counts maximal runs of such
    * positions, max_span_tokens = longest run + k − 1 (its token length),
    * and dup_frac = n_dup_grams / max(n_grams, 1) rounded 6 dp. */
  def perDoc(df: DataFrame, textCol: String, idCol: String,
             k: Int = 5, minDocs: Int = 2): DataFrame = {
    // tokenize in its own projection so the n-gram HOF reads an attribute,
    // not a re-evaluated split (see Text.ngramsFromTokens)
    val base = df.select(col(idCol).as("__id"),
        Text.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), size(col("__toks")).cast("long").as("__nt"),
        Text.ngramsFromTokens(col("__toks"), k).as("__grams"))
    // postings feed both the doc-frequency agg and the probe side of the
    // dup join — truncate so the explode runs once (lazily: the first
    // action materializes, the second reads cached blocks)
    val grams = graft.io.Checkpoints.truncate(
      base.select(col("__id"), posexplode(col("__grams")))
        .select(col("__id"), (col("pos") + 1).cast("long").as("__pos"),
          col("col").as("__gram")),
      eager = false)
    // distinct-doc support per gram: two-level agg (gram, doc) → gram so
    // the distinct never builds per-group hash sets over a hot gram
    val dup = grams.select(col("__gram"), col("__id")).distinct()
      .groupBy("__gram").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__gram")
    val islands = grams.join(dup, "__gram")
      .withColumn("__island", col("__pos") - row_number().over(
        Window.partitionBy("__id").orderBy("__pos")))
      .groupBy(col("__id"), col("__island"))
      .agg(count(lit(1)).as("__ilen"))
    val agg = islands.groupBy("__id").agg(
      sum(col("__ilen")).as("__ndup"),
      count(lit(1)).as("__nspans"),
      (max(col("__ilen")) + (k - 1)).as("__maxspan"))
    base.join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__ndup"), lit(0L)).as("n_dup_grams"),
        coalesce(col("__nspans"), lit(0L)).as("n_spans"),
        coalesce(col("__maxspan"), lit(0L)).as("max_span_tokens"),
        round(coalesce(col("__ndup"), lit(0L)).cast("double") /
          greatest(col("__nt") - (k - 1), lit(1L)), 6).as("dup_frac"))
  }
}
