package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level guards against the corpus-cardinality broadcast class of bug
  * (round-8 verdict items #3/#4): a `broadcast()` hint on a table whose row
  * count grows with the corpus (one row per document, per user, ...) is
  * invisible at sf0.1 and an executor OOM at 100 TB. These tests assert the
  * *executed* plan shape so a regression fails here, not on a cluster.
  *
  * Broadcasts of genuinely bounded sides (dim tables, |dims|-row stats,
  * k-row centroids) are fine and not asserted against.
  */
class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    df.collect() // executes THIS QueryExecution so AQE's plan is final
    df.queryExecution.executedPlan.toString
  }

  test("q100_pipeline_e2e: keep-first dedup is a window, not a corpus semi-join") {
    // packOffsets legitimately broadcasts its O(buckets) offset table, so
    // "no BroadcastExchange" is too strict here; the regression being
    // guarded is the corpus-cardinality keepers table coming back as a
    // (broadcast) LEFT SEMI join on doc_id — assert the join shape is gone
    // and the md5 keep-first window took its place.
    val plan = executedPlan("q100_pipeline_e2e")
    assert(!plan.contains("LeftSemi"),
      s"q100 re-grew the keepers semi-join (corpus-cardinality build side at scale):\n$plan")
    assert(plan.contains("md5"), "expected the md5(text) keep-first window partition key")
    assert(plan.contains("Window"), "expected the keep-first window")
  }

  test("q137_retention: cohort week is a window over user_id, not a per-user broadcast") {
    val plan = executedPlan("q137_retention")
    assert(!plan.contains("BroadcastExchange"),
      s"q137 plan re-grew a broadcast on the per-user side:\n$plan")
    assert(plan.contains("Window"), "expected min(wk) over partition by user_id")
  }

  test("q93_standardize: the only broadcast side is the |dims|-row stats table") {
    // q93 DOES broadcast — legitimately: the stats side is one row per
    // embedding dimension (bounded by the model, not the corpus). Pin that
    // the broadcast subtree aggregates on dim, so a refactor that
    // accidentally broadcasts the exploded fact side trips this.
    val plan = executedPlan("q93_standardize")
    assert(plan.contains("BroadcastExchange"), "q93 should broadcast the per-dim stats")
    // the broadcast feeds a BroadcastHashJoin whose build side aggregated on
    // dim — if the fact stream (posexplode output) were the build side there
    // would be no HashAggregate under the exchange
    assert(plan.contains("HashAggregate"),
      "broadcast side should be the aggregated stats, not the fact stream")
  }

  test("q193_balanced_shards: global rank is bucketed, not a corpus-wide window") {
    // the scale cliff being guarded: row_number() over (ORDER BY w) with no
    // partition — every row through ONE partition. The two-phase form keeps
    // a __bucket partition key on the corpus-side window; the only
    // unpartitioned window runs over the O(buckets) offset table, whose
    // broadcast back is the plan's BroadcastExchange.
    val plan = executedPlan("q193_balanced_shards")
    assert(plan.contains("__bucket"),
      s"expected the value-range __bucket partition key in the rank window:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "expected the O(buckets) offset table broadcast back")
  }

  test("q261_analyze_columns: the stack unpivot profiles all columns in ONE scan") {
    // the whole point of the stack form is one pass over the table; a
    // refactor to per-column aggregates would read the parquet 6 times.
    // Count scans in the FINAL plan only — AQE's toString appends an
    // "== Initial Plan ==" echo that would double-count.
    val plan = executedPlan("q261_analyze_columns")
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one parquet scan, saw $scans:\n$plan")
  }

  test("q256_systematic_pps: prefix sum is bucketed, not a corpus-wide window") {
    // the PPS cumulative-weight line must come from GlobalRank's
    // two-phase decomposition: per-bucket windows keyed by __bkt, with
    // the offset table broadcast back — a corpus-wide ordered window
    // here would single-partition the whole doc table at 100 TB
    val plan = executedPlan("q256_systematic_pps")
    assert(plan.contains("__bkt"),
      s"expected the bucketed prefix-sum partition key:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "expected the O(buckets) offset broadcast")
  }

  test("q281_pareto_frontier: running max is bucketed, not a corpus-wide window") {
    val plan = executedPlan("q281_pareto_frontier")
    assert(plan.contains("__bkt"),
      s"expected the two-phase prefix-MAX bucket key:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "expected the O(buckets) offset broadcast")
  }

  test("q239_merkle_audit: two keyed digest aggs, no broadcast, no corpus sort") {
    // the Merkle shape that scales: row hashes shuffle ONCE on the
    // bucket key, bucket digests re-aggregate to one row — per-group
    // state is |rows|/16^prefixChars by construction. A global Sort or
    // any BroadcastExchange here means the digest replanned through a
    // corpus-wide path.
    val plan = executedPlan("q239_merkle_audit")
    assert(!plan.contains("BroadcastExchange"),
      s"q239 must not broadcast anything:\n$plan")
    assert(plan.contains("collect_list"),
      "expected per-bucket sorted row-hash digests via collect_list")
    assert(!plan.contains("Sort ["),
      s"digest ordering is array_sort inside the agg, not a plan Sort:\n$plan")
  }

  test("requireEvalBound: fail-loud past the bound, pass-through inside it") {
    // q224's "eval-set², not corpus²" contract is enforced by
    // Similarity.requireEvalBound — prove both arms with a tiny bound so
    // the 100k production bound never needs a 100k-row fixture.
    import spark.implicits._
    val small = (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "x")
    val big = (1 to 12).map(i => (i.toLong, s"v$i")).toDF("id", "x")
    // inside the bound: same frame back, usable for chaining
    assert(graft.similarity.Similarity.requireEvalBound(small, 10L).count() == 5)
    // past the bound: IllegalArgumentException naming the contract
    val e = intercept[IllegalArgumentException] {
      graft.similarity.Similarity.requireEvalBound(big, 10L, "test eval")
    }
    assert(e.getMessage.contains("test eval"))
    assert(e.getMessage.contains("eval-set"))
  }

  test("q200_link_prediction: hub-degree cap prunes apexes before the wedge self-join") {
    // r17: the capped adjacency is lineage-truncated, so the semi join
    // runs at checkpoint materialization and no longer renders in the
    // final plan — assert the cap's PLACEMENT by value instead, on a
    // fixture where it is observable: a deg-5 hub shared by (1, 2) must
    // not count toward their common-neighbor total (apex enumeration is
    // capped), while the jaccard denominator keeps FULL degrees.
    import spark.implicits._
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L),
      (1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L)).toDF("u", "v")
    val out = graft.graph.LinkPrediction
      .jaccardPairs(edges, minCommon = 2, maxDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // common(1,2) = 2 (apexes 10 and 11; the deg-5 hub 100 is pruned —
    // a post-join cap would read 3); denominator = full deg 3 + 3 − 2
    assert(out((1L, 2L)) == (2L, 0.5), out)
    // no pair survives on hub-only evidence: (3,4)/(3,5)/(4,5) share
    // ONLY the pruned hub and must be absent
    assert(!out.contains((3L, 4L)) && !out.contains((3L, 5L)) &&
      !out.contains((4L, 5L)), out)
  }
}
