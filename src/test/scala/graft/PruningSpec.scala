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
