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

  test("forward as-of: earliest at-or-after match, equal ts included, no-match null") {
    val left = Seq(
      (1L, "u1", ts(5)),    // before r10, r50 → matches r10
      (2L, "u1", ts(10)),   // equal ts to r10 → matches r10 (>=)
      (3L, "u1", ts(60)),   // after every right row → null
      (4L, "u2", ts(100)))  // key with no right rows at all → null
      .toDF("event_id", "key", "t")
    val right = Seq(
      (10L, "u1", ts(10), 1.5),
      (50L, "u1", ts(50), 2.5))
      .toDF("rid", "key", "t", "rv")
    val out = AsOfJoin.forward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"))
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(1.5)),
      (2L, Some(10L), Some(1.5)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("forward tie rule: smallest tie-break wins equal (key, ts)") {
    val left = Seq((1L, "u", ts(40))).toDF("event_id", "key", "t")
    val right = Seq(
      (7L, "u", ts(50), Option.empty[Double]), // winner has a NULL field
      (9L, "u", ts(50), Option(1.0)))
      .toDF("rid", "key", "t", "rv")
    val out = AsOfJoin.forward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"))
      .as[(Long, Option[Long], Option[Double])].collect()
    // rid=7 wins the tie; its null rv must NOT fall back to rid=9's 1.0
    assert(out.toSeq == Seq((1L, Some(7L), None)))
  }

  test("nearest as-of: closer side wins; ties (incl. exact ts) go backward") {
    val left = Seq(
      (1L, "u1", ts(18)),   // r10 at d=8, r50 at d=32 → backward r10
      (2L, "u1", ts(48)),   // r10 at d=38, r50 at d=2 → forward r50
      (3L, "u1", ts(30)),   // d=20 both ways → tie → backward r10
      (4L, "u1", ts(10)),   // exact match distance 0 → r10
      (5L, "u1", ts(3)),    // nothing before → forward r10
      (6L, "u1", ts(99)),   // nothing after → backward r50
      (7L, "u2", ts(10)))   // key with no right rows → null
      .toDF("event_id", "key", "t")
    val right = Seq(
      (10L, "u1", ts(10), 1.5),
      (50L, "u1", ts(50), 2.5))
      .toDF("rid", "key", "t", "rv")
    val out = AsOfJoin.nearest(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"))
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(1.5)),
      (2L, Some(50L), Some(2.5)),
      (3L, Some(10L), Some(1.5)),
      (4L, Some(10L), Some(1.5)),
      (5L, Some(10L), Some(1.5)),
      (6L, Some(50L), Some(2.5)),
      (7L, None, None)))
  }

  test("nearest == manual min-|d| reconciliation of backward and forward on real events") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, TestSpark.sf0001)
    val purchases = e.filter(col("event_type") === "purchase")
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"), max(col("value")).as("view_value"))
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                String, String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
      f(purchases, views, "user_id", "ts", "event_id", "view_id",
        Seq("view_id", "view_value"))
        .as[(Long, Option[Long], Option[Double])].collect().map(r => r._1 -> r).toMap
    val nearest = run(AsOfJoin.nearest(_, _, _, _, _, _, _))
    val back = run(AsOfJoin.backward(_, _, _, _, _, _, _))
    val fwd = run(AsOfJoin.forward(_, _, _, _, _, _, _))
    val rightTs = views.select(col("view_id"), col("ts").cast("double"))
      .as[(Long, Double)].collect().toMap
    val leftTs = purchases.select(col("event_id"), col("ts").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(nearest.nonEmpty && nearest.keySet == back.keySet)
    nearest.foreach { case (id, got) =>
      val expected = (back(id)._2, fwd(id)._2) match {
        case (None, _) => fwd(id)
        case (_, None) => back(id)
        case (Some(b), Some(f)) =>
          val db = leftTs(id) - rightTs(b)
          val df = rightTs(f) - leftTs(id)
          if (df < db) fwd(id) else back(id)
      }
      assert(got == expected, s"event $id")
    }
  }

  test("tolerance (merge_asof semantics): boundary inclusive, stale match nulled, " +
       "nearest prefers the in-tolerance side") {
    val right = Seq(
      (10L, "u", ts(100), 1.0),
      (20L, "u", ts(300), 2.0))
      .toDF("rid", "key", "t", "rv")
    // backward, tol=50: left at 149 matches r10 (d=49); at 151 the only
    // at-or-before row is 51 away → null; at 150 boundary d=50 included
    val left = Seq((1L, "u", ts(149)), (2L, "u", ts(151)), (3L, "u", ts(150)))
      .toDF("event_id", "key", "t")
    val back = AsOfJoin.backward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"), toleranceSecs = Some(50.0))
      .orderBy("event_id").as[(Long, Option[Long], Option[Double])].collect()
    assert(back.toSeq == Seq(
      (1L, Some(10L), Some(1.0)),
      (2L, None, None),
      (3L, Some(10L), Some(1.0))))
    // nearest, tol=60: left at 240 is 140 from r10 and 60 from r20 —
    // r20 in tolerance wins; at 170 (70 from r10, 130 from r20) BOTH are
    // out of tolerance → null even though matches exist untolerated
    val l2 = Seq((1L, "u", ts(240)), (2L, "u", ts(170))).toDF("event_id", "key", "t")
    val near = AsOfJoin.nearest(l2, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"), toleranceSecs = Some(60.0))
      .orderBy("event_id").as[(Long, Option[Long], Option[Double])].collect()
    assert(near.toSeq == Seq((1L, Some(20L), Some(2.0)), (2L, None, None)))
    // nearest, tol=45: the NEARER side (r10 at d=40 from ts 140) stays in
    // tolerance and wins over r20 (d=160, out)
    val l3 = Seq((1L, "u", ts(140))).toDF("event_id", "key", "t")
    val n3 = AsOfJoin.nearest(l3, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"), toleranceSecs = Some(45.0))
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(n3.toSeq == Seq((1L, Some(10L), Some(1.0))))
    // forward with tolerance
    val fwd = AsOfJoin.forward(left, right, "key", "t", "event_id", "rid",
        Seq("rid", "rv"), toleranceSecs = Some(150.0))
      .orderBy("event_id").as[(Long, Option[Long], Option[Double])].collect()
    assert(fwd.toSeq == Seq(
      (1L, None, None),             // 300-149=151 > 150 → out of tolerance
      (2L, Some(20L), Some(2.0)),   // d=149, in
      (3L, Some(20L), Some(2.0))))  // d=150, boundary inclusive
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
