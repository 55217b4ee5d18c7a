package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistics operators (SURVEY.md §2.9 M1-M4, M8).
  *
  * The reference computes these with R's in-memory `cov`/`cor`/`chisq.test`/
  * `aov` (`R_groupe4.R:789-902`). Here each reduces to grouped/global
  * aggregation — a single map-side-combined shuffle producing a tiny result,
  * so every one of these scales linearly with input and is independent of
  * driver memory. No `.collect()` mid-plan anywhere.
  */
object Stats {

  /** M1/M2 — pairwise covariance + Pearson correlation for the given column
    * pairs, "complete.obs" semantics per pair (ref `R_groupe4.R:789-818`:
    * `cov`/`cor(use="complete.obs")`). One row out per pair. */
  def corrPairs(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(
        corr(col(a), col(b)).as(s"corr_${a}_${b}"),
        covar_samp(col(a), col(b)).as(s"cov_${a}_${b}"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** M3/M4 — Pearson χ² statistic of independence for two categorical
    * columns (ref `R_groupe4.R:831-841,876-902`; no Yates correction, as R
    * applies it only to 2×2 tables — SURVEY.md §7-4).
    *
    * Contingency counts via one hash aggregation; margins via windows over
    * the (tiny: |distinct a|×|distinct b| rows) count table, so the heavy
    * input is touched exactly once. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("r"), col(bCol).as("c"))
      .agg(count(lit(1)).cast("double").as("o"))
    val wAll = Window.partitionBy()
    val e = obs
      .withColumn("rm", sum("o").over(Window.partitionBy("r")))
      .withColumn("cm", sum("o").over(Window.partitionBy("c")))
      .withColumn("n", sum("o").over(wAll))
      .withColumn("exp", col("rm") * col("cm") / col("n"))
    val d = col("o") - col("exp")
    e.agg(
      sum(d * d / col("exp")).as("chi2_stat"),
      ((countDistinct("r") - 1) * (countDistinct("c") - 1)).as("dof"))
  }

  /** M8 — one-way ANOVA (F statistic) of `valueCol` across groups of
    * `groupCol` (ref `R_groupe4.R:872-874`: `aov(age_estim ~ clc_quartier)`).
    *
    * Classic sufficient-statistics decomposition: per-group (n, mean, var)
    * from one aggregation; SS_between = Σ n_g(m_g − gm)², SS_within =
    * Σ (n_g−1)·var_g. Exact, one pass, no iteration. */
  def anova(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("double").as("n"),
        avg(col(valueCol)).as("m"),
        var_samp(col(valueCol)).as("v"))
    val wAll = Window.partitionBy()
    val t = g
      .withColumn("nn", sum("n").over(wAll))
      .withColumn("gm", sum(col("n") * col("m")).over(wAll) / col("nn"))
      .withColumn("k", count(lit(1)).over(wAll).cast("double"))
    val dm = col("m") - col("gm")
    t.agg(
      (sum(col("n") * (dm * dm)) / (max("k") - 1)).as("ms_between"),
      (sum((col("n") - 1) * col("v")) / (max("nn") - max("k"))).as("ms_within"))
      .withColumn("f_stat", col("ms_between") / col("ms_within"))
  }

  /** A2 — exact quantiles (ref `R_groupe4.R:219-222`). Exact `percentile`
    * for oracle parity; at unbounded scale callers switch to
    * `approx = true` (t-digest-style `percentile_approx`, SURVEY.md §7-3). */
  def quantiles(df: DataFrame, c: String, probs: Seq[Double], approx: Boolean = false): Column = {
    val arr = probs.mkString("array(", ",", ")")
    if (approx) expr(s"percentile_approx($c, $arr, 10000)")
    else expr(s"percentile($c, $arr)")
  }
}
