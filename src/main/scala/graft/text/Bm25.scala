package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson–Spärck Jones / Okapi) — the classic
  * term-weighting complement to the embedding-ANN family
  * ([[graft.similarity.Similarity]]): score(d, q) =
  * Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Shape at scale: the corpus is reduced ONCE to (doc, token, tf) + per-doc
  * lengths (one explode + two hash aggs — the q79 TF-IDF shape); the query
  * term list is a broadcast literal, so scoring touches only postings of
  * query terms (at 100 TB with a bucketed-by-token postings layout — q118 —
  * this is an index lookup, not a corpus scan). Corpus-wide scalars (N,
  * avgdl) ride a broadcast 1-row cross join, never a collect.
  *
  * Float-parity design (the oracle replays scores exactly):
  *  - idf uses `ln`, which is NOT guaranteed bit-identical across libms —
  *    so scores are rounded (4 dp) on both engines per the house rule, and
  *    ranking orders by (rounded score desc, doc_id asc): a total order
  *    over values both engines agree on. avgdl is an integer sum divided
  *    by an integer count — IEEE-exact on both sides.
  *  - idf is the BM25+ `ln(1 + (N − df + 0.5)/(df + 0.5))` form: strictly
  *    positive even for df > N/2, so common-term matches can't produce
  *    the negative-weight surprises of the raw RSJ form. */
object Bm25 {

  /** Top-k docs for one query-term set. Output: (doc_id, score, rnk). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val postings = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("token"))
    val tf = postings.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = postings.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus scalars: N docs, total tokens — exact integer sums
    val scalars = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(postings.agg(count(lit(1)).as("total_toks")))
      .select(col("n_docs"),
        (col("total_toks").cast("double") / col("n_docs")).as("avgdl"))
    val df_ = postings.filter(col("token").isin(queryTerms: _*))
      .groupBy("token").agg(count_distinct(col("doc_id")).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.filter(col("token").isin(queryTerms: _*))
      .join(broadcast(df_), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .groupBy("doc_id")
      .agg(round(sum(idf * tfNorm), 4).as("score"))
    // global top-k via orderBy+limit → TakeOrderedAndProject (parallel
    // partial heaps, no single-partition corpus-wide window — the q116
    // shape); the rank window then runs over the k survivors only
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
  }
}
