package graft

import graft.functions.AnyBandEqual
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** any_band_equal — the codegen'd LSH band-membership kernel behind
  * Dedup.minHashLshSweep (derives coarser bandings from the finest
  * self-join without re-joining). */
class AnyBandEqualSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact band semantics for r = 2 over 4-wide signatures") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 9L), true),   // band 0 matches
      (Seq(1L, 2L, 3L, 4L), Seq(9L, 9L, 3L, 4L), true),   // band 1 matches
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 9L, 4L), false),  // straddled only
      (Seq(1L, 2L, 3L, 4L), Seq(9L, 9L, 9L, 9L), false),  // none
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L), true)    // all
    ).toDF("a", "b", "want")
    df.collect() // materialize fixture before asserting on derived column
    val got = df.select(AnyBandEqual(col("a"), col("b"), 2).as("m"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r))
  }

  test("matches the HOF slice-equality spelling on random-ish arrays") {
    val df = spark.range(200).select(
      array((0 until 16).map(i => pmod(xxhash64(col("id") + i), lit(7))): _*).as("a"),
      array((0 until 16).map(i => pmod(xxhash64(col("id") * 3 + i), lit(7))): _*).as("b"))
    for (r <- Seq(1, 2, 4, 8)) {
      val bands = 16 / r
      val hof = exists(sequence(lit(0), lit(bands - 1)),
        i => slice(col("a"), i * r + 1, lit(r)) ===
          slice(col("b"), i * r + 1, lit(r)))
      val rows = df.select(AnyBandEqual(col("a"), col("b"), r).as("got"),
        hof.as("want")).collect()
      rows.foreach(x => assert(x.getBoolean(0) == x.getBoolean(1), s"r=$r $x"))
    }
  }

  test("null array gives null; r = 1 equals match_count >= 1") {
    val dfNull = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b").select(AnyBandEqual(col("a"), col("b"), 2).as("m"))
    assert(dfNull.collect().head.isNullAt(0))
    val df = spark.range(100).select(
      array(pmod(xxhash64(col("id")), lit(3)), lit(7L)).as("a"),
      array(pmod(xxhash64(col("id") + 1), lit(3)), lit(8L)).as("b"))
    val rows = df.select(AnyBandEqual(col("a"), col("b"), 1).as("m"),
      (graft.functions.MatchCount(col("a"), col("b")) >= 1).as("want")).collect()
    rows.foreach(x => assert(x.getBoolean(0) == x.getBoolean(1), x))
  }

  test("stays inside WholeStageCodegen on a non-foldable source") {
    val df = spark.range(50)
      .select(AnyBandEqual(
        array(col("id"), lit(1L), col("id") * 2, lit(2L)),
        array(col("id"), lit(9L), col("id") * 2, lit(2L)), 2).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [any_band_equal("), plan)
    // band 0 = (id, 1) vs (id, 9): never equal; band 1 = (2id, 2) vs
    // (2id, 2): always equal
    assert(df.collect().forall(_.getBoolean(0)))
  }
}
