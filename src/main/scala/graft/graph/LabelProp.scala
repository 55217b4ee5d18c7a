package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — communities
  * emerge from every node adopting its neighborhood's majority label each
  * round. Deterministic by construction: ties break by smallest label
  * (the total-order rule every ranking op in this engine uses), so the
  * fixed iteration count replays identically in a SQL oracle.
  *
  * Per round: one join of the label table to the edge list (shuffle on
  * dst) + one (src, label) hash agg + a per-src rank — window input is
  * the |src × neighbor-labels| COUNT table, never the raw edges. Same
  * shuffle shape as PageRank; the edge list is checkpointed once and
  * reused by every round. */
object LabelProp {

  /** `edges`: DIRECTED (src, dst) rows — symmetrize upstream for
    * undirected graphs. Every node needs ≥ 1 out-edge (isolated nodes
    * have no neighborhood to vote). Returns (node, label). */
  def run(edges: DataFrame, iters: Int = 2): DataFrame = {
    // Pre-hashed AND pre-sorted on dst (the iteration join key), so no
    // round re-shuffles or re-sorts the edge table — LogicalRDD preserves
    // both; only the node-cardinality label table moves per iteration
    // (the PageRank.iterate seam + its r16 sorted-checkpoint device).
    val e = graft.io.Checkpoints.truncateLayoutPreserving(
      edges.select(col("src"), col("dst"))
        .repartition(col("dst")).sortWithinPartitions("dst"))
    val nodes = e.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      val counts = e
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("src")
        .orderBy(col("c").desc, col("label").asc)
      labels = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("src").as("node"), col("label"))
    }
    labels
  }
}
