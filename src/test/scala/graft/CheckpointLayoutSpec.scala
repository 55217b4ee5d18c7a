package graft



import graft.io.Checkpoints

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Checkpoints.truncateLayoutPreserving]] contract the
  * iterative graph operators rely on (r16): the materialized table's
  * partitioning AND ordering must be visible to downstream planning even
  * under AQE, and derived re-layouts (the Hits eSrc→eDst shape) must read
  * the parent's cache, not re-scan the source files. AQE silently broke
  * both for Dataset checkpoints (AdaptiveSparkPlanExec reports
  * UnknownPartitioning at the layout-capture point), which cost a
  * measured 262-339 GB of per-query re-sort spill at sf100 before the
  * persist-based seam landed. */
class CheckpointLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** True iff the plan's only parquet scans sit INSIDE an
    * InMemoryRelation's displayed build plan — i.e. every top-level leaf
    * is a cache scan. (Task-level input-bytes can NOT distinguish here:
    * cache-block reads are reported as input bytes too.) */
  private def scansOnlyCache(df: DataFrame): Boolean = {
    val lines = df.queryExecution.executedPlan.toString().linesIterator.toVector
    val firstCache = lines.indexWhere(_.contains("InMemoryRelation"))
    val firstFile = lines.indexWhere(_.contains("Scan parquet"))
    firstCache >= 0 && (firstFile < 0 || firstFile > firstCache)
  }

  test("layout-preserving truncate: join on the layout key plans no " +
    "exchange or sort above the cached edge side (AQE on)") {
    assume(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val e = Checkpoints.truncateLayoutPreserving(
      spark.range(0, 10000)
        .select(($"id" % 100).as("src"), ($"id" % 7).as("dst"))
        .repartition($"src").sortWithinPartitions("src"))
    try {
      val rank = spark.range(0, 100).select($"id".as("src"), lit(1.0).as("pr"))
      val j = e.join(rank.hint("merge"), Seq("src"))
      j.write.mode("overwrite").format("noop").save()
      val plan = j.queryExecution.executedPlan.toString()
      // the cached edge side must feed the SMJ directly: between the join
      // node and its cache scan there must be no Sort or Exchange (the
      // cached plan's INTERNAL sort/exchange, displayed nested under
      // InMemoryRelation, is the one-time build cost and doesn't count)
      val lines = plan.linesIterator.toVector
      val joinAt = lines.indexWhere(_.contains("SortMergeJoin"))
      val scanAt = lines.indexWhere(_.contains("InMemoryTableScan"), joinAt)
      assert(joinAt >= 0 && scanAt > joinAt, plan)
      val between = lines.slice(joinAt + 1, scanAt)
      assert(!between.exists(l => l.contains("Sort") || l.contains("Exchange")),
        s"sort/exchange above the cached edge side:\n$plan")
    } finally e.unpersist()
  }

  test("derived re-layout persists read the parent cache, not the files " +
    "(the Hits eSrc -> eDst shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec")
      .resolve("edges.parquet").toString
    spark.range(0, 50000)
      .select(($"id" % 500).as("src"), ($"id" % 11).as("dst"))
      .write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    val eSrc = Checkpoints.truncateLayoutPreserving(
      raw.distinct().repartition($"src").sortWithinPartitions("src"))
    val eDst = Checkpoints.truncateLayoutPreserving(
      eSrc.repartition($"dst").sortWithinPartitions("dst"))
    try {
      assert(scansOnlyCache(eSrc), "eSrc consumption plans a file scan")
      assert(scansOnlyCache(eDst), "eDst consumption plans a file scan")
      assert(scansOnlyCache(eSrc.select($"src").distinct()),
        "derived aggregation over the cache plans a file scan")
    } finally { eDst.unpersist(); eSrc.unpersist() }
  }
}
