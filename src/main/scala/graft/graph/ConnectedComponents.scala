package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — the shared fixpoint core behind near-dup
  * canonicalization ([[graft.dedup.Dedup.canonicalize]] /
  * `canonicalizeExact`) and any other union-find-shaped grouping
  * (entity resolution, q153). Two value-identical paths behind a
  * size-aware dispatch: a driver union-find when the edge list's
  * plan-estimated size fits the broadcast threshold (one collect — the
  * same risk bound as any broadcast join — instead of 3-4 distributed
  * rounds), and the checkpointed min-label fixpoint beyond it (the
  * 100 TB path).
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
    // Materialize the (un-symmetrized) edge list ONCE — both paths need
    // it evaluated anyway (the iterative path would checkpoint it for the
    // fixpoint; the local path collects it), so the exact-count dispatch
    // probe is one cheap job over already-cached blocks, not an extra
    // evaluation of the (often expensive — PPJoin) upstream. A
    // plan-stats dispatch (the knnImpute device) is useless here: join
    // size estimates without CBO column stats blow up multiplicatively
    // (measured 4.2e20 "bytes" for a 256-row PPJoin output).
    val raw = graft.io.Checkpoints.truncate(
      pairs.select(col("id_a"), col("id_b")), eager = true)
    val maxLocal = pairs.sparkSession.conf
      .getOption("spark.graft.cc.localMaxEdges").map(_.toLong)
      .getOrElse(derivedLocalMaxEdges(Runtime.getRuntime.maxMemory))
    if (maxLocal >= 0 && raw.count() <= maxLocal)
      (minLabelLocal(raw, nodes), true)
    else minLabelIterative(raw, nodes, maxRounds)
  }

  /** Default local-path edge budget, derived from the DRIVER's heap
    * instead of a flat constant (a 1M default is ~200-300 MB of driver
    * heap — fine on a 48 GB audit JVM, an OOM on a 1 GB driver). Cost
    * model (see [[minLabelLocal]]): ~300 B/edge — one collected Row plus
    * up to two boxed HashMap entries. Budget: ~1/32 of the heap, so
    * edges = maxMemory / (32 · 300 B) — ≈110k edges on a 1 GB driver
    * (the scaladoc's long-standing guidance), ≈890k at the 8 GB build
    * default (continuity with the old 1M constant), ≈5M at the 48 GB
    * audit size. `spark.graft.cc.localMaxEdges` overrides (−1 forces the
    * iterative path). */
  private[graft] def derivedLocalMaxEdges(maxMemoryBytes: Long): Long =
    maxMemoryBytes / 9600L

  /** Driver union-find (path-halving + union-by-attachment to the
    * order-smaller root), value-identical to the fixpoint: each
    * component's label is its minimum node id under the id type's
    * natural ordering — the same ordering `min(label)` aggregates by on
    * the distributed path (equivalence case in GraphMetricsSpec).
    * Always "converged": union-find has no round bound to exhaust.
    * Bounded by the dispatch above (`spark.graft.cc.localMaxEdges`, or
    * the heap-derived [[derivedLocalMaxEdges]] default; ~300 B/edge —
    * one collected Row plus up to two boxed HashMap entries, an order
    * more than a broadcast join's packed bytes — so the budget keys on
    * the DRIVER's heap, not the executors'). Set the conf to -1 to
    * force the iterative path. */
  private[graft] def minLabelLocal(pairs: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val idType = pairs.schema("id_a").dataType
    val edgeRows = pairs.select(col("id_a"), col("id_b")).collect()
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x0: Any): Any = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    // attach the order-larger root under the smaller: the root IS the
    // component minimum at all times, no second pass needed. Strings
    // compare by UNSIGNED UTF-8 BYTES — Spark's min(label) on the
    // iterative path orders UTF8String binary, and Java's String '<'
    // (UTF-16 code units) disagrees with it for non-BMP code points
    // (surrogate pairs sort below U+E000..U+FFFF in UTF-16 but above in
    // UTF-8), which would make the two dispatch paths pick different
    // component labels.
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    val lt: (Any, Any) => Boolean = idType match {
      case org.apache.spark.sql.types.LongType =>
        (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case org.apache.spark.sql.types.IntegerType =>
        (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
      case org.apache.spark.sql.types.StringType =>
        (a, b) => utf8Lt(a.asInstanceOf[String], b.asInstanceOf[String])
      case t => throw new IllegalArgumentException(
        s"minLabelLocal: unsupported id type $t (long/int/string)")
    }
    edgeRows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb }
    }
    val labelRows = parent.keys.toSeq.map { n =>
      org.apache.spark.sql.Row(n, find(n))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", idType),
      org.apache.spark.sql.types.StructField("label", idType)))
    val labels = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(labelRows).asJava),
      schema)
    // the labels side is driver-built and threshold-bounded → broadcast;
    // the corpus-side nodes never shuffle
    nodes.select(col("node"))
      .join(broadcast(labels), Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  private[graft] def minLabelIterative(pairs: DataFrame, nodes: DataFrame,
                                       maxRounds: Int): (DataFrame, Boolean) = {
    // Pre-hash AND pre-sort the symmetrized edge list on id_b (the key
    // every round's label join probes) through the layout-preserving seam
    // — a plain checkpoint under AQE reports UnknownPartitioning and
    // every round would re-shuffle and re-sort the edges (the r16 sf100
    // graph finding); with the layout visible, only the label table and
    // the edge-sized min-agg move per round (the PageRank.iterate seam).
    val edges = graft.io.Checkpoints.truncateLayoutPreserving(
      pairs.select(col("id_a"), col("id_b"))
        .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        .repartition(col("id_b")).sortWithinPartitions("id_b"))
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
      // POINTER JUMPING: l(v) ← l(l(v)). One extra label-table self-join
      // per round turns O(diameter) rounds into O(log diameter) — a
      // path component of length 2^r converges in ~r rounds, so a small
      // caller round budget (canonicalize's default 4) covers any graph a
      // heap-demoted dispatch can route here, instead of throwing
      // "fixpoint not reached" on inputs the local path used to absorb
      // (environment-dependent behavior). Invariant preserved: l(v) is
      // always the id of a node in v's component with l(v) ≤ v, so the
      // fixpoint is still exactly the per-component minimum, and the
      // convergence probe is untouched — neighborMin changing nothing
      // means labels are constant along (symmetrized) edges, at which
      // point the shortcut is a no-op by construction. Fewer rounds =
      // fewer edge-sized shuffles, which is the term that matters at
      // corpus scale (the label self-join moves only the label table).
      if (!converged) {
        // The probe side of l(v) ← l(l(v)) is keyed on `label`, which is
        // maximally skewed exactly as a large component converges (every
        // member carries the same label). Counter-measure: the lookup side
        // is not the full label table but only the rows whose node IS a
        // live label value — bounded by the number of distinct labels,
        // which collapses toward component count as rounds progress. AQE
        // sees that runtime size and flips the join to broadcast-hash just
        // when the skew would peak, taking the probe-side shuffle (and its
        // one-task-per-giant-component hazard) out of the plan entirely;
        // in early rounds where the lookup is still table-sized, the join
        // stays sort-merge and AQE's skew-split handles the outer side.
        val lblVals = labels.select(col("label").as("__lv")).distinct()
        val lookup = labels
          .join(lblVals, col("node") === col("__lv"), "left_semi")
          .select(col("node").as("label"), col("label").as("__ll"))
        labels = graft.io.Checkpoints.truncate(
          labels.join(lookup, Seq("label"), "left")
            .select(col("node"),
              coalesce(col("__ll"), col("label")).as("label")),
          eager = false)
      }
      round += 1
    }
    val all = nodes.select(col("node"))
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    (all, converged)
  }
}
