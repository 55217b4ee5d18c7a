package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled source mixing — the multilingual/multi-source
  * sampling rule from the large-LM training literature (sample source s
  * with probability ∝ p_s^τ, τ < 1 flattening the natural distribution so
  * head sources stop drowning out the tail).
  *
  * τ is fixed at 1/2 — the standard published value — because p^(1/2) is
  * `sqrt`, which is correctly-rounded IEEE on every engine; a general
  * `pow(x, τ)` is not guaranteed bit-identical across libm
  * implementations, and the whole operator is designed to be exactly
  * replayable by an external SQL oracle (the OracleHashes design rule).
  *
  * Determinism end to end:
  *  - per-source weights sqrt(n_s) need no normalizing constant fight:
  *    the denominator Σ√n_s is computed as a SEQUENTIAL fold over the
  *    source-ascending list (collect_list → sort_array → aggregate), so
  *    the float sum has one defined association order on any engine;
  *  - target counts are floor(budget · √n_s / Σ√n_s) — identical IEEE
  *    operand sequence ⇒ identical doubles ⇒ identical floors;
  *  - row selection inside a source is rank-by-md5(id): engine-neutral,
  *    reproducible, no RNG.
  *
  * Scale shape: the weight table is |sources| rows (an aggregate +
  * broadcast); selection is one window per source partition. The
  * rank-window sorts each source's rows by hash — O(n log n) per source
  * and skew-prone if one source dominates. The 100 TB variant replaces
  * the exact rank with a hash-THRESHOLD filter (keep md5(id)/2^32 <
  * t_s/n_s — one map-side pass, no sort, count only approximately t_s);
  * the exact-rank form here is the reproducible-split contract, and the
  * threshold form is `temperatureMixThreshold`.
  */
object Mixing {

  private def hashRank(idCol: Column): Column = md5(idCol.cast("string"))

  /** Exact-count mix: per source s, the floor(budget·√n_s / Σ√n_s)
    * lowest-md5 rows. Output: (id, source) of the selected rows plus the
    * source's target count. */
  def temperatureMix(docs: DataFrame, srcCol: String, idCol: String,
                     budget: Long): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("__cnt"))
    // Σ√n_s as a sequential source-asc fold — ONE defined summation order
    val denom = counts
      .agg(sort_array(collect_list(struct(col(srcCol), col("__cnt")))).as("__l"))
      .select(aggregate(
        transform(col("__l"), x => sqrt(x.getField("__cnt").cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("__wsum"))
    val targets = counts.crossJoin(broadcast(denom))
      .select(col(srcCol),
        floor(lit(budget.toDouble) * sqrt(col("__cnt").cast("double")) / col("__wsum"))
          .cast("long").as("target_cnt"))
    val w = Window.partitionBy(srcCol)
      .orderBy(hashRank(col(idCol)).asc, col(idCol).asc)
    docs.select(col(idCol), col(srcCol))
      .withColumn("__rnk", row_number().over(w))
      .join(broadcast(targets), Seq(srcCol))
      .filter(col("__rnk") <= col("target_cnt"))
      .select(col(idCol), col(srcCol), col("target_cnt"))
  }

  /** Map-side approximate mix — the 100 TB form: keep a row iff
    * u(id) < budget·√n_s / (Σ√n_s · n_s), where u(id) is the md5-derived
    * uniform in [0,1) (the q103 construction). No sort, no window, no
    * shuffle beyond the tiny counts aggregate; selected counts are
    * Binomial(n_s, t_s/n_s) ≈ t_s. Deterministic given the id column. */
  def temperatureMixThreshold(docs: DataFrame, srcCol: String, idCol: String,
                              budget: Long): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("__cnt"))
    val denom = counts
      .agg(sort_array(collect_list(struct(col(srcCol), col("__cnt")))).as("__l"))
      .select(aggregate(
        transform(col("__l"), x => sqrt(x.getField("__cnt").cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("__wsum"))
    val rates = counts.crossJoin(broadcast(denom))
      .select(col(srcCol),
        least(lit(1.0), lit(budget.toDouble) * sqrt(col("__cnt").cast("double"))
          / (col("__wsum") * col("__cnt").cast("double"))).as("__rate"))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    docs.select(col(idCol), col(srcCol))
      .join(broadcast(rates), Seq(srcCol))
      .filter(u < col("__rate"))
      .select(col(idCol), col(srcCol))
  }
}
