package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level evidence that scans stay minimal (the "pushed down and
  * pruned" contract from the brief): partition pruning on a
  * partitioned-layout write, and filter pushdown + column pruning on the
  * harness tables. */
class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partition pruning: filter on the partition column prunes the file listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_p"
    Tables.events(spark, TestSpark.sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val n = q.collect().length // executes THIS dataset's QueryExecution
    assert(n ==
      Tables.events(spark, TestSpark.sf0001).filter(col("event_type") === "click").count())
    // runtime truth: the numFiles metric after execution vs files on disk
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scanned = scans.map(_.metrics("numFiles").value).sum
    val allFiles = scans.map(_.relation.location.inputFiles.length).sum
    val partDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_type="))
    assert(partDirs == 5, s"expected 5 partition dirs, got $partDirs")
    assert(scanned >= 1 && scanned < allFiles,
      s"pruning ineffective: $scanned of $allFiles files scanned")
  }

  test("sorted layout: row-group min/max stats skip data for point predicates") {
    // The clustering counterpart of partition pruning: within a file,
    // parquet row groups carry min/max column stats, and a pushed predicate
    // skips whole row groups whose range excludes it. Sorting by the filter
    // column at write time makes those ranges disjoint — a point predicate
    // then reads ~1 row group instead of all of them. At 100 TB this (sort
    // or z-order on the hot filter columns) is the difference between a
    // full-file scan and a targeted read; here it is observable in the
    // scan's numOutputRows (rows surviving row-group skipping, before
    // Spark's row-level Filter).
    val base = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.01") // 10k rows
      .select("event_id", "user_id", "value")
    // tiny row groups so one file holds many (parquet.block.size is a
    // write-path knob; 16 KiB → dozens of groups at this row width)
    def write(df: org.apache.spark.sql.DataFrame, path: String) = df
      .coalesce(1).write.option("parquet.block.size", 16 * 1024)
      .mode("overwrite").parquet(path)
    write(ev.sortWithinPartitions("user_id"), s"$base/sorted")
    write(ev.sortWithinPartitions("value"), s"$base/unsorted") // ~random in user_id
    def scanRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path).filter(col("user_id") === 7L)
      val n = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      (scan.metrics("numOutputRows").value, n)
    }
    val (sortedScan, hits1) = scanRows(s"$base/sorted")
    val (unsortedScan, hits2) = scanRows(s"$base/unsorted")
    assert(hits1 == hits2) // same answer either way
    // the sorted layout must skip most row groups; the unsorted one can't
    assert(sortedScan < unsortedScan / 4,
      s"row-group skipping ineffective: sorted scan $sortedScan rows vs unsorted $unsortedScan")
  }

  test("top-k per group plans a WindowGroupLimit (rank pushdown, no full sort retain)") {
    val q = graft.operators.Rankings.topKPerGroup(
      Tables.orders(spark, TestSpark.sf0001).select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("filter pushdown + column pruning reach the parquet scan") {
    val q = Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_quantity") > 25 && col("l_returnflag") === "A")
      .select("l_orderkey")
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity,25.0)"), pushed)
    assert(pushed.contains("EqualTo(l_returnflag,A)"), pushed)
    // ReadSchema carries only the needed columns, not all 11
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }
}
