package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling: each round drops every
  * node whose current degree is below `k`, then removes the dropped
  * nodes' incident edges. After enough rounds the survivors are exactly
  * the k-core (the maximal subgraph of min-degree ≥ k); a FIXED round
  * count gives the deterministic partial peel that a SQL oracle can
  * unroll round-by-round (the q159/q133 replay rule — everything here is
  * integer, so no rounding seam at all).
  *
  * Scale shape: per round one count aggregation (shuffle on node) and two
  * semi-joins (shuffle on src/dst) — no all-pairs anywhere; the caller
  * checkpoints the edge list once so the (possibly expensive) edge-build
  * subtree is not recomputed per round. Peeling strictly shrinks the edge
  * set, so later rounds cost monotonically less. */
object KCore {

  /** `edges` must be DIRECTED-symmetrized (both (u,v) and (v,u) present)
    * so a node's out-edge count IS its undirected degree. Returns the
    * surviving nodes with their degree in the `rounds`-times-peeled
    * graph. */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var g = edges.select(col("src"), col("dst"))
    for (r <- 1 to rounds) {
      // keep is read TWICE (both semi-joins) and g THREE times (keep's
      // agg + the join chain feeding next round's recomputes): left
      // unmaterialized the unrolled plan replays round r-1's join chain
      // ~2x per subsequent round (the HITS half-step lesson). keep is
      // node-cardinality — truncate it; g shrinks monotonically — persist
      // each round's survivor edges and drop the previous round's cache
      // once the new one is materialized, so at most two rounds of edges
      // are ever resident.
      val keep = graft.io.Checkpoints.truncate(
        g.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("node")),
        eager = true)
      val prev = g
      g = graft.io.Checkpoints.truncateLayoutPreserving(
        g.join(keep.withColumnRenamed("node", "src"), Seq("src"), "semi")
          .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "semi"))
      if (r > 1) prev.unpersist(false)
    }
    g.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
