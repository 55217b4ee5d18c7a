package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("backward as-of: latest at-or-before match, equal ts included, no-match null") {
    val left = Seq(
      (1L, "u1", ts(100)),  // after r10, r50 → matches r50
      (2L, "u1", ts(50)),   // equal ts to r50 → matches r50 (<=)
      (3L, "u1", ts(5)),    // before any right row → null
      (4L, "u2", ts(100)))  // key with no right rows at all → null
      .toDF("event_id", "key", "t")
    val right = Seq(
      (10L, "u1", ts(10), 1.5),
      (50L, "u1", ts(50), 2.5))
      .toDF("rid", "key", "t", "rv")
    val out = AsOfJoin.backward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"))
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, Some(50L), Some(2.5)),
      (2L, Some(50L), Some(2.5)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("duplicate right timestamps: greatest tie-break wins; null fields don't tear") {
    val left = Seq((1L, "u", ts(60))).toDF("event_id", "key", "t")
    val right = Seq(
      (7L, "u", ts(50), Option(1.0)),
      (9L, "u", ts(50), Option.empty[Double])) // winner has a NULL field
      .toDF("rid", "key", "t", "rv")
    val out = AsOfJoin.backward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"))
      .as[(Long, Option[Long], Option[Double])].collect()
    // rid=9 wins the tie; its null rv must NOT fall back to rid=7's 1.0
    assert(out.toSeq == Seq((1L, Some(9L), None)))
  }
}
