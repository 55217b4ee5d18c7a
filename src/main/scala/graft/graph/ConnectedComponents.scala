package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the shared
  * fixpoint core behind near-dup canonicalization
  * ([[graft.dedup.Dedup.canonicalize]] / `canonicalizeExact`) and any
  * other union-find-shaped grouping (entity resolution, q153).
  *
  * Each round is one join + one min-aggregation (two shuffles) over the
  * edge list and label table, independent of corpus size; every round's
  * output is checkpointed — without lineage truncation the plan doubles
  * per iteration. Checkpoints go through [[graft.io.Checkpoints.truncate]]:
  * executor-local by default, reliable (executor-loss-safe) when
  * `spark.graft.checkpointDir` is set — the cluster deployment knob. The
  * per-round convergence probe is one tiny count job on
  * already-checkpointed data.
  *
  * Labels are the node ids themselves, so any ORDERABLE id type works
  * (longs, strings); the fixpoint label is the component minimum under
  * that ordering. Rounds needed = component diameter (min-label floods one
  * hop per round); near-dup and ER clusters have single-digit diameters,
  * so `maxRounds` is a backstop, not a tuning knob. */
object ConnectedComponents {

  /** `pairs`: undirected edges as (id_a, id_b), either orientation, dups
    * fine. `nodes`: (node) — every node that needs a label, including
    * isolated ones. Returns (labels, converged): labels = (node, label)
    * with label the component minimum reached; converged = false iff
    * maxRounds ran out with changes still flowing.
    *
    * Only EDGE-TOUCHED nodes iterate: an isolated node's label is itself
    * by definition and can never change, so carrying the full node set
    * through every round's join+agg shuffle is pure waste — in a near-dup
    * corpus the edge-node set is a small fraction of the corpus, so the
    * per-round working set is O(edges), not O(nodes). Singletons get
    * label = node via one final left join. */
  def minLabel(pairs: DataFrame, nodes: DataFrame,
               maxRounds: Int): (DataFrame, Boolean) = {
    // Pre-hash the symmetrized edge list on id_b (the key every round's
    // label join probes): LogicalRDD preserves the partitioning, so no
    // round re-shuffles the edges — only the label table and the
    // edge-sized min-agg move per round (the PageRank.iterate seam).
    val edges = graft.io.Checkpoints.truncate(
      pairs.select(col("id_a"), col("id_b"))
        .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        .repartition(col("id_b")),
      eager = true)
    var labels = graft.io.Checkpoints.truncate(
      edges.select(col("id_a").as("node")).distinct()
        .select(col("node"), col("node").as("label")), eager = true)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "id_b"), "id_b")
        .groupBy(col("id_a").as("node")).agg(min(col("label")).as("nlabel"))
      // lazy checkpoint + limit-1 probe: the probe is the materializing
      // action, so convergence costs no extra job — when a change exists
      // the probe early-exits (remaining partitions materialize under the
      // next round's join); when none does, the full scan it needs anyway
      // completes the checkpoint.
      val next = graft.io.Checkpoints.truncate(
        labels.join(neighborMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
            (col("nlabel") < col("label")).as("changed")),
        eager = false)
      converged = next.filter(col("changed")).limit(1).count() == 0
      labels = next.drop("changed")
      round += 1
    }
    val all = nodes.select(col("node"))
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    (all, converged)
  }
}
