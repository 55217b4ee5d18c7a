package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Eval-set decontamination: flag training documents that share verbatim
  * token n-grams with a held-out evaluation set — the overlap check every
  * serious pretraining run performs before training (the GPT-3 paper's
  * 13-gram filter is the canonical form; `k` is a parameter here because
  * the sandbox corpus documents are short).
  *
  * Shape at scale: the eval set is benchmark-sized (MBs) against a corpus
  * of TBs, so the eval side reduces to a DISTINCT gram set that is
  * BROADCAST — the corpus-side check is then a map-side hash-semi-join at
  * parquet-scan speed with zero shuffle of corpus text. If the eval side
  * ever outgrows broadcast, `broadcastEval = false` degrades to a
  * shuffled equi-join on the gram (both sides exploded — the inverted-
  * index shape of q34), never a cross join.
  *
  * Per-doc grams are de-duplicated BEFORE the join (array_distinct inside
  * the projection), so `shared_grams` counts distinct contaminating
  * grams and join fan-out is bounded by document length, not gram
  * frequency. */
object Decontaminate {

  /** Annotates every corpus row with `shared_grams` (distinct k-gram
    * overlap count with `evalSet`, BIGINT) and `contaminated` (0/1
    * BIGINT counting flag). Corpus rows are preserved exactly (left
    * join); eval docs themselves should be excluded by the caller if
    * they live in the same table. */
  def flagContaminated(corpus: DataFrame, evalSet: DataFrame,
                       idCol: String, textCol: String, k: Int,
                       broadcastEval: Boolean = true): DataFrame = {
    // tokenize in a separate projection — the n-gram HOF over an attribute
    // avoids per-position re-splitting (see Text.ngramsFromTokens)
    val evalGrams = evalSet
      .select(Text.tokens(col(textCol)).as("__toks"))
      .select(explode(Text.ngramsFromTokens(col("__toks"), k)).as("__gram"))
      .distinct()
    val probe = if (broadcastEval) F.broadcast(evalGrams) else evalGrams
    val corpusGrams = corpus
      .select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(array_distinct(Text.ngramsFromTokens(col("__toks"), k)))
          .as("__gram"))
    val shared = corpusGrams.join(probe, "__gram")
      .groupBy(idCol).agg(count(lit(1)).as("__shared"))
    corpus.join(shared, Seq(idCol), "left")
      .withColumn("shared_grams", coalesce(col("__shared"), lit(0L)))
      .withColumn("contaminated", (col("shared_grams") > 0).cast("long"))
      .drop("__shared")
  }
}
