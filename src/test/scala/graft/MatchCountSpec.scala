package graft

import graft.functions.MatchCount
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** match_count — the codegen'd MinHash-agreement kernel (replaces the
  * interpreted aggregate(zip_with(...)) fold in the LSH paths). */
class MatchCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals the HOF fold on random signature pairs") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)),   // 2 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                    // all agree
      (Seq(1L, 2L), Seq(3L, 4L)),                    // none
      (Seq.empty[Long], Seq.empty[Long])             // empty → 0
    ).toDF("a", "b")
    val got = df.select(
      MatchCount(col("a"), col("b")).as("mc"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("hof"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 2, 0, 0))
  }

  test("null array gives null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(MatchCount(col("a"), col("b")).as("mc"))
    assert(df.collect().head.isNullAt(0))
  }

  test("stays inside WholeStageCodegen on a non-foldable source") {
    // literals constant-fold to a LocalTableScan, and transform() is
    // itself CodegenFallback — build the arrays with CreateArray
    // (codegen'd) over range() so the generated loop actually runs
    val df = spark.range(100)
      .select(MatchCount(
        array(lit(0L), col("id"), col("id") * 2),
        array(lit(0L), col("id") * 3, col("id") * 2))
        .as("mc"))
    // the compact rendering marks codegen'd operators with a "*(n)"
    // prefix (a CodegenFallback expression would strip it from Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [match_count("), plan)
    // id=0: all 3 positions agree (all zero); id>0: positions 0 and 2
    val got = df.collect().map(_.getInt(0))
    assert(got.head == 3 && got.tail.forall(_ == 2))
  }
}
