package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) —
  * rank a raw corpus by how target-like each document's unigram profile is.
  * The DSIR estimator scores a document by the log importance ratio of a
  * bag-of-features model fit on the target slice vs the raw corpus:
  * w(doc) = Σ_tokens [ln p̂_target(w) − ln p̂_raw(w)] with add-1 smoothing;
  * the top-weighted documents are the resampled training set. (The paper
  * hashes n-grams into buckets; on this corpus's bounded vocabulary the
  * exact unigram table IS the feature space, which also keeps the operator
  * SQL-oracle-able. A hashed variant only changes the grouping key.)
  *
  * Scale shape: one token explode, one vocabulary-sized count table
  * (map-side partial agg), one broadcast of two scalar totals, one join of
  * postings against the (vocab-sized) log-ratio table, one per-doc sum.
  * Selection avoids a global sort: the top-k boundary key comes from a
  * TakeOrdered (orderBy+limit — per-partition top-k then a driver merge of
  * k·partitions rows), and membership is a broadcast threshold compare, so
  * nothing ever shuffles to one partition.
  *
  * Parity rules: per-word log-ratios are single-ln over exact integer
  * ratios, rounded 6 dp; per-doc sums rounded 4 dp; the (weight, id)
  * selection key is a total order. */
object Dsir {

  /** (idCol, weight, selected): add-1-smoothed unigram log importance
    * weight of each document against `isTarget` rows, with the `topK`
    * docs by (weight desc, id asc) flagged selected. */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, topK: Int): DataFrame = {
    val tok = df.select(col(idCol).as("__id"), isTarget.as("__t"),
        explode(Text.tokens(col(textCol))).as("__w"))
    // the three scalars are marginals of the vocab table — deriving them
    // from wc (truncated: it also feeds the log-ratio join) removes a
    // whole tokenize+explode+agg corpus pass that the separate
    // countDistinct aggregate paid (r17; the SortAggregate×2 PLAN_AUDIT
    // flag was the distinct-rewrite expand of that extra pass)
    val wc = graft.io.Checkpoints.truncate(
      tok.groupBy("__w").agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        count(lit(1)).as("__cr")), eager = false)
    val scalars = wc.agg(
      count(lit(1)).as("__v"),
      sum(col("__ct")).as("__tt"),
      sum(col("__cr")).as("__tr"))
    // ln of one exact integer ratio (products stay well under 2^53 for any
    // per-shard vocabulary; shard the model, not the math, beyond that).
    // Ratios are kept as exact integer MICRO-units so the per-doc sum is
    // long arithmetic — order-independent, no 4th-dp half-boundary flips
    // from float accumulation (the sum/1e6 division is then a correctly-
    // rounded op on identical bits in any engine).
    val lr = wc.crossJoin(broadcast(scalars))
      .select(col("__w"), round(log(
        ((col("__ct") + 1) * (col("__tr") + col("__v"))).cast("double") /
          ((col("__cr") + 1) * (col("__tt") + col("__v")))) * 1e6)
        .cast("long").as("__lrw6"))
    val weights = tok.join(lr, "__w")
      .groupBy(col("__id"))
      .agg(round(sum(col("__lrw6")).cast("double") / 1e6, 4).as("weight"))
    // total-order selection key; -weight is an exact IEEE negation
    val key = struct((-col("weight")).as("nw"), col("__id").as("id"))
    val boundary = weights.select(key.as("__k")).orderBy(col("__k"))
      .limit(topK).agg(max(col("__k")).as("__kmax"))
    weights.crossJoin(broadcast(boundary))
      .select(col("__id").as(idCol), col("weight"),
        (key <= col("__kmax")).as("selected"))
  }
}
