package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Per-document cross-entropy under an in-corpus add-1-smoothed BIGRAM
  * language model — the KenLM-shaped perplexity filter of CCNet/RefinedWeb
  * pipelines, one Markov order above q125's unigram score. A doc whose
  * token transitions are improbable under the corpus LM (high H) is
  * boilerplate/gibberish; low H is fluent-but-typical text.
  *
  *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
  *   H(doc)   = − Σ ln p(w2|w1) / n_bigrams
  *
  * Scale shape (all linear, postings-style):
  *   1. bigram stream        — per-row explode, no shuffle;
  *   2. c(w1,w2)             — one map-side-combined hash agg;
  *   3. c(w1,·)              — derived from the c2 TABLE (|distinct grams|
  *                             rows), not by re-scanning the stream;
  *   4. stream ⋈ logprob     — shuffle join on gram (the q122/q125 shape);
  *   5. per-doc sum          — hash agg on doc_id.
  *
  * Cross-engine parity: each gram's log-prob is ONE ln of an exact integer
  * ratio, rounded to integer micro-nats (the q183 device), so per-doc sums
  * are exact long arithmetic and order-independent; H is one mirrored
  * division rounded to 4 dp.
  */
object BigramLm {

  /** Returns (idCol, n_bigrams, h). Docs with < 2 tokens get (0, 0.0). */
  def perDocCrossEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col(idCol),
      explode(Text.ngramsFromTokens(col("__toks"), 2)).as("gram"))
    val c2 = grams.groupBy("gram").agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vdf = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val lp = c2.join(c1, "w1").crossJoin(F.broadcast(vdf))
      .select(col("gram"),
        round(log((col("c2") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")) * 1000000).cast("long").as("lp6"))
    val perDoc = grams.join(lp, "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_bigrams"), sum(col("lp6")).as("s6"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round((-col("s6")).cast("double") / lit(1000000) / col("n_bigrams"), 4),
          lit(0.0)).as("h"))
  }

  /** Per-document cross-entropy under interpolated KNESER-NEY (d = 0.75)
    * — the smoothing KenLM actually ships, replacing add-1's uniform
    * back-off with the continuation probability ("how many distinct
    * contexts does this word complete?"), which is what separates a
    * frequent-but-context-locked token (e.g. "Francisco") from a freely
    * combining one:
    *
    *   P(w2|w1) = (c(w1,w2) − d)/c(w1,·)
    *            + d·N₁₊(w1,·)/c(w1,·) · N₁₊(·,w2)/B
    *
    * with N₁₊ the distinct-continuation counts and B = |bigram types|.
    * Every scored bigram is corpus-observed (we score the corpus under
    * its own LM), so c ≥ 1 and the max(·,0) clamp never binds — no
    * unseen-event back-off path is needed.
    *
    * Same scale shape as [[perDocCrossEntropy]]; the continuation tables
    * N₁₊ are derived from the c2 TABLE (|gram types| rows), never from
    * the token stream. All smoothing ingredients are exact integers; P is
    * one fixed-order float expression and ln P goes to micro-nats, so
    * per-doc sums stay exact long arithmetic. */
  def knPerDocCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                           discount: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col(idCol),
      explode(Text.ngramsFromTokens(col("__toks"), 2)).as("gram"))
    val c2 = grams.groupBy("gram").agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"),
      count(lit(1)).as("n1f"))
    val n1b = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val btot = c2.agg(count(lit(1)).as("b"))
    val lp = c2.join(c1, "w1").join(n1b, "w2").crossJoin(F.broadcast(btot))
      .select(col("gram"),
        round(log(
          (col("c2").cast("double") - lit(discount)) / col("c1") +
            lit(discount) * col("n1f") / col("c1") *
              (col("n1b").cast("double") / col("b"))) * 1000000)
          .cast("long").as("lp6"))
    val perDoc = grams.join(lp, "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_bigrams"), sum(col("lp6")).as("s6"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round((-col("s6")).cast("double") / lit(1000000) / col("n_bigrams"), 4),
          lit(0.0)).as("h_kn"))
  }
}
