package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned form equals the naive θ-join, including edge points and overlaps") {
    val facts = Seq(0.0, 49.999, 50.0, 75.5, 149.9, 200.0, 999.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("fid", "point")
    // overlapping + touching + wide ranges, deliberately not bin-aligned
    val ranges = Seq(
      (1L, 0.0, 50.0), (2L, 50.0, 150.0), (3L, 40.0, 80.0), (4L, 0.0, 1000.0))
      .toDF("rid", "lo", "hi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("fid", "rid").as[(Long, Long)].collect().toSet
    val naive = canon(RangeJoin.naive(facts, ranges, "point", "lo", "hi"))
    for (w <- Seq(7.0, 50.0, 333.0)) {
      val b = canon(RangeJoin.binned(facts, ranges, "point", "lo", "hi", w))
      assert(b == naive, s"binWidth=$w diverged")
    }
    // spot semantics: hi exclusive, lo inclusive
    assert(naive.contains((2L, 2L)))  // 50.0 in [50, 150)
    assert(!naive.contains((2L, 1L))) // 50.0 not in [0, 50)
    assert(naive.contains((0L, 1L)))  // 0.0 in [0, 50)
  }
}
