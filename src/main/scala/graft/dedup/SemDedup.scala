package graft.dedup

import graft.ml.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication via embedding clustering (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540): k-means partitions the
  * embedding space, then near-duplicate pruning runs INSIDE each cluster
  * only. This catches paraphrases and re-encodings that share no n-grams
  * (invisible to MinHash/SimHash/Jaccard — q32/q33/q34's lexical view)
  * while avoiding the all-pairs cosine join: pairwise work is
  * O(Σ|cluster|²), and k is chosen ∝ corpus size so cluster width stays
  * bounded — exactly the published algorithm's scale argument (the paper
  * runs it on LAION-scale data with k in the tens of thousands).
  *
  * Survivor rule: within a cluster, a row is dropped iff some LOWER-id
  * row in the same cluster has cosine ≥ `threshold` — the deterministic
  * lowest-id-survivor convention the exact-dedup family already uses
  * (q03/q94), replacing the paper's keep-farthest-from-centroid pick so
  * the kept set is engine-replayable.
  *
  * Parity: clustering is [[KMeans.lloyd]] (every step oracle-replayable,
  * q105), and the cosine is the same sequential fold the q27/q69 oracles
  * replay bit-for-bit — so the unrounded `>= threshold` comparison is
  * engine-exact and the oracle recomputes train → assign → pairwise →
  * flag end-to-end in SQL.
  */
object SemDedup {

  /** Annotates every embedding row with its k-means `cluster` (BIGINT)
    * and `kept` (0/1 BIGINT counting flag; 0 = semantic duplicate of a
    * lower-id same-cluster row at cosine ≥ threshold).
    *
    * SIZING RULE (measured, r14 sf10 audit): the O(Σ|cluster|²) bound is
    * only sub-quadratic if `k` GROWS with the corpus — at a FIXED k the
    * within-cell pair count is n²/k and the cluster equi-join's shuffle
    * parallelism is capped at k partitions (q108's pinned k=8 measured
    * 44× wall at 10× rows, sf1→sf10). Size k ≈ n / targetCellSize with
    * targetCellSize a few thousand (the paper uses k in the tens of
    * thousands at LAION scale); k×dims doubles per Lloyd round is the
    * only driver-side state, so large k costs one wider broadcast, not a
    * new shuffle. q108 keeps k=8 because its DuckDB oracle replays that
    * exact k-means trace. */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
               k: Int, trainIters: Int, threshold: Double): DataFrame = {
    val assigned = KMeans.lloyd(vecs, idCol, vecCol, k, trainIters)
    // norms once per ROW (NormD), one tight-loop dot per PAIR — the
    // q27/q69 pattern: same IEEE sequence as the per-pair HOF cosine
    // (norms are per-row constants), so values are bit-unchanged while
    // the dominant per-pair cost drops to a single JVM loop.
    val v = vecs.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val withVec = assigned.join(v, idCol)
      .withColumn("__n", graft.functions.NormD(col("__v")))
    val a = withVec.select(col(idCol).as("__id_a"), col("cluster"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = withVec.select(col(idCol).as("__id_b"), col("cluster"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // Equi-join on cluster (shuffle partitioned by cluster id), id-ordered
    // so each duplicate pair is examined once; never a cross join.
    val dropped = a.join(b, "cluster")
      .where(col("__id_a") < col("__id_b"))
      .where(graft.functions.DotProductD(col("__va"), col("__vb"))
        / (col("__na") * col("__nb")) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
    withVec.join(dropped.withColumn("__dup", lit(1L)), Seq(idCol), "left")
      .withColumn("kept", col("__dup").isNull.cast("long"))
      .select(col(idCol), col("cluster"), col("kept"))
  }
}
