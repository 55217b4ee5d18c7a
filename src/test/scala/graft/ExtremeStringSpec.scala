package graft

import graft.functions.ExtremeString
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** min_str/max_str — the typed string extremes that keep q261's column
  * profiler in ObjectHashAggregate (builtin string min/max degrade the
  * whole aggregation to SortAggregate). */
class ExtremeStringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches builtin min/max exactly, incl. unicode and empty strings") {
    val rows = Seq("b", "", "é", "B", "zz", "0", "ß").map(("g", _)) ++
      Seq(("h", "only"))
    val df = rows.toDF("g", "s").groupBy("g").agg(
      ExtremeString.minStr(col("s")).as("mn"),
      ExtremeString.maxStr(col("s")).as("mx"),
      min(col("s")).as("bmn"), max(col("s")).as("bmx"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(3), s"min diverged: $r")
      assert(r.getString(2) == r.getString(4), s"max diverged: $r")
    }
  }

  test("nulls are ignored; an all-null group yields null (not empty string)") {
    val df = Seq(("g", Some("x")), ("g", None), ("n", None), ("n", None))
      .toDF("g", "s").groupBy("g").agg(
        ExtremeString.minStr(col("s")).as("mn"),
        ExtremeString.maxStr(col("s")).as("mx"))
    val got = df.collect().map(r => r.getString(0) ->
      (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(got("g") == ((Some("x"), Some("x"))))
    assert(got("n") == ((None, None)))
  }

  test("empty string survives the serialize round-trip as a real value") {
    // many partitions force partial buffers through serialize/deserialize;
    // "" must stay distinguishable from "no value seen"
    val df = (1 to 64).map(i => ("g", if (i == 1) "" else "z"))
      .toDF("g", "s").repartition(16).groupBy("g").agg(
        ExtremeString.minStr(col("s")).as("mn"))
    assert(df.collect().head.getString(1) == "")
  }

  test("plans ObjectHashAggregate, not SortAggregate") {
    val df = Seq(("g", "a"), ("g", "b")).toDF("g", "s")
      .groupBy("g").agg(ExtremeString.minStr(col("s")).as("mn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
