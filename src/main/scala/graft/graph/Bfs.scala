package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first hop distance by synchronous min-relaxation:
  * `rounds` rounds of "my hop = min(my hop, neighbor hop + 1)". Nodes
  * unreached within `rounds` hops are absent from the result. Min
  * propagation is monotone, so re-relaxing settled nodes is harmless —
  * no frontier bookkeeping is needed for small fixed round counts, and
  * the all-integer arithmetic lets a SQL oracle unroll the rounds
  * exactly.
  *
  * Scale shape: per round one equi-join of the edge list to the current
  * label table (shuffle on dst) and one min aggregation (shuffle on
  * node). The label table is bounded by the reachable node set and is
  * materialized through the [[graft.io.Checkpoints]] seam every round
  * (it fans out twice per round), so lineage depth stays at one round
  * for arbitrarily deep traversals. */
object Bfs {

  /** `edges` directed-symmetrized (src, dst); `seeds` one column `node`.
    * Returns (node, hop) for every node within `rounds` hops of a seed. */
  def hops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    var labels = seeds.select(col("node"), lit(0L).as("hop"))
    for (r <- 1 to rounds) {
      // labels is read twice per round (the relax join + the union):
      // unmaterialized, the unrolled plan replays round r-1's edge join
      // ~2x per subsequent round — 2^rounds replays of the first join by
      // the end (the HITS half-step lesson). The table is bounded by the
      // reached node set, so persist it each round and drop the previous
      // round's cache once the new one is materialized.
      val prev = labels
      labels = graft.io.Checkpoints.truncateLayoutPreserving(
        labels.unionAll(edges
            .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
            .select(col("src").as("node"), (col("hop") + 1).as("hop")))
          .groupBy("node").agg(min(col("hop")).as("hop")))
      if (r > 1) prev.unpersist(false)
    }
    labels
  }
}
