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
  * node). The label table is bounded by the reachable node set; for deep
  * traversals insert a [[graft.io.Checkpoints]] seam every few rounds
  * like the connected-components fixpoint does. */
object Bfs {

  /** `edges` directed-symmetrized (src, dst); `seeds` one column `node`.
    * Returns (node, hop) for every node within `rounds` hops of a seed. */
  def hops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    var labels = seeds.select(col("node"), lit(0L).as("hop"))
    for (_ <- 1 to rounds) {
      val relaxed = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), (col("hop") + 1).as("hop"))
      labels = labels.unionAll(relaxed)
        .groupBy("node").agg(min(col("hop")).as("hop"))
    }
    labels
  }
}
