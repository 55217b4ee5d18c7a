package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) by power iteration over a
  * DIRECTED edge list — the directed companion to [[PageRank]]: a good
  * hub points at good authorities, a good authority is pointed at by good
  * hubs. On the customer→supplier purchase graph this separates
  * broad-basket buyers (hubs) from widely-bought-from suppliers
  * (authorities), which PageRank's single score conflates.
  *
  * Per half-iteration: one join of the score table to the edge list
  * (shuffle on the score side's key) + one hash agg on the other
  * endpoint — identical shuffle shape to PageRank, fully distributed.
  *
  * Engine-replayable arithmetic (the PageRank design rule): incoming
  * float sums are rounded to `roundDp` each half-step, and normalization
  * is by the MAX score — an order-independent reduction — rather than the
  * conventional L2/L1 norm, whose order-dependent float total would
  * diverge across engines. Max-normalized HITS converges to the same
  * ranking (power iteration is invariant up to scaling).
  *
  * Caller contract: edges are directed (src, dst); hubs are scored over
  * nodes with out-edges, authorities over nodes with in-edges (for the
  * bipartite purchase graph that is exactly customers / suppliers). */
object Hits {

  /** Returns (kind ∈ {hub, auth}, node, score) with score ∈ (0, 1],
    * max-normalized, rounded to 6 dp. */
  def iterate(edges: DataFrame, iters: Int = 2, roundDp: Int = 8): DataFrame = {
    require(iters >= 1)
    // Two checkpointed copies of the edge list, pre-hashed on the key each
    // half-step joins on (src for the hub→auth push, dst for auth→hub):
    // LogicalRDD preserves the partitioning, so no iteration ever
    // re-shuffles the edge table — only the node-cardinality score tables
    // move. 2× edge storage buys shuffle-free edge joins at every round
    // (the PageRank.iterate seam, doubled because HITS alternates keys).
    // Each copy is also SORTED on its join key within partitions — the
    // PageRank.iterate r16 device: LogicalRDD preserves ordering, so the
    // per-half-step sort-merge joins never re-sort the edge side (only
    // the node-cardinality score tables), turning 2·iters edge-table
    // sorts into the two checkpoint-time ones.
    val eSrc = graft.io.Checkpoints.truncateLayoutPreserving(
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("src")).sortWithinPartitions("src"))
    val eDst = graft.io.Checkpoints.truncateLayoutPreserving(
      eSrc.repartition(col("dst")).sortWithinPartitions("dst"))
    var hub = eSrc.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("score"))
    var auth: DataFrame = hub // replaced in the first half-iteration
    for (_ <- 1 to iters) {
      val a0 = eSrc.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(round(sum(col("score")), roundDp).as("__raw"))
      val amax = a0.agg(max(col("__raw")).as("__mx"))
      auth = a0.crossJoin(broadcast(amax))
        .select(col("node"), round(col("__raw") / col("__mx"), roundDp).as("score"))
      val h0 = eDst.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(round(sum(col("score")), roundDp).as("__raw"))
      val hmax = h0.agg(max(col("__raw")).as("__mx"))
      hub = h0.crossJoin(broadcast(hmax))
        .select(col("node"), round(col("__raw") / col("__mx"), roundDp).as("score"))
    }
    hub.select(lit("hub").as("kind"), col("node"),
        round(col("score"), 6).as("score"))
      .unionByName(auth.select(lit("auth").as("kind"), col("node"),
        round(col("score"), 6).as("score")))
  }
}
