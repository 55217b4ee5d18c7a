package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality bucketing (Wenzek et al., LREC 2020):
  * score each document by its per-token LM log-probability, cut the corpus
  * into head / middle / tail terciles, and keep head+middle — the standard
  * web-corpus triage step before training. CCNet uses a KenLM 5-gram; the
  * engine's in-corpus unigram LM (the q125 score) is the same decision
  * shape with a model that both engines can replay exactly.
  *
  * The tercile thresholds here are the corpus-exact percentiles (one
  * all-data percentile agg, broadcast back). At 100 TB the thresholds
  * would come from a fixed-size sample or a mergeable quantile sketch
  * (percentile_approx) instead — the bucketing join is unchanged; exact
  * percentiles keep the operator bit-replayable by the SQL oracle. */
object LmQuality {

  /** (idCol, score, bucket, keep): score = per-doc mean unigram logprob
    * (4 dp); bucket = head (top tercile) / middle / tail; keep = not tail. */
  def ccnetBuckets(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("__id"),
      explode(Text.tokens(col(textCol))).as("__w"))
    val freq = tok.groupBy("__w").agg(count(lit(1)).as("__f"))
    val total = tok.agg(count(lit(1)).as("__t"))
    val score = tok.join(freq, "__w")
      .crossJoin(broadcast(total))
      .groupBy(col("__id"))
      .agg(round(sum(log(col("__f").cast("double") / col("__t"))) /
        count(lit(1)), 4).as("score"))
    val cuts = score.agg(
      expr("percentile(score, 0.33333333)").as("__t1"),
      expr("percentile(score, 0.66666667)").as("__t2"))
    score.crossJoin(broadcast(cuts))
      .select(col("__id").as(idCol), col("score"),
        when(col("score") >= col("__t2"), "head")
          .when(col("score") >= col("__t1"), "middle")
          .otherwise("tail").as("bucket"),
        (col("score") >= col("__t1")).as("keep"))
  }
}
