package graft

import org.scalatest.funsuite.AnyFunSuite

/** q326–q329: Hill tail index, MATTR lexical diversity, Markov entropy
  * rate, sequential co-purchase — each on a planted fixture whose closed
  * form is hand-computable (a star graph's one tail degree, all-same /
  * all-distinct / period-2 token streams, a deterministic event chain,
  * and a 3-order basket sequence).
  */
class CorpusDynamicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def hm(h: Int): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(60L * h))

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q326: a 10-spoke hub is the whole tail; its Hill alpha is closed-form") {
    val dir = tmpDir("graft_hill")
    // hub part 100 shares TWO orders with each of parts 1..10 (support-2
    // edges); spokes never pair with each other (one order per pair).
    // Degrees: hub 10, spokes 1 -> tail (deg >= 5) = {hub},
    // alpha = 1 + 1/round(ln(10/5), 6).
    val rows = (1 to 10).flatMap { sp =>
      Seq((sp * 2L, 100L), (sp * 2L, sp.toLong),
        (sp * 2L + 1L, 100L), (sp * 2L + 1L, sp.toLong))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q326_hill_tail")(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    val lt = r6(math.log(2.0))
    assert(r == Seq((5L, 1L, Some(r4(1.0 + 1.0 / lt)))))
  }

  test("q326: a tail sitting exactly at x_min has zero log-sum -> null alpha") {
    val dir = tmpDir("graft_hill0")
    // hub 100 with exactly 5 spokes: deg(hub)=5=x_min, ln(1)=0
    val rows = (1 to 5).flatMap { sp =>
      Seq((sp * 2L, 100L), (sp * 2L, sp.toLong),
        (sp * 2L + 1L, 100L), (sp * 2L + 1L, sp.toLong))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q326_hill_tail")(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(r == Seq((5L, 1L, None)))
  }

  test("q327: MATTR hits 1/W, 1.0, and 2/W on planted token streams") {
    val dir = tmpDir("graft_mattr")
    Seq(
      (1L, Seq.fill(10)("a").mkString(" ")),            // 1 window, TTR 0.1
      (2L, (1 to 11).map("w" + _).mkString(" ")),       // all-distinct, 1.0
      (3L, Seq.fill(6)("a b").mkString(" ")),           // period 2, TTR 0.2
      (4L, "too short to score"),                       // n < W -> absent
      (5L, "x  y " + (1 to 8).map("v" + _).mkString(" ")) // double space
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q327_mattr")(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 5: the empty token from the double space is dropped -> 10
    // distinct tokens, one full window, MATTR 1.0
    assert(r == Seq((1L, 10L, 0.1), (2L, 11L, 1.0), (3L, 12L, 0.2),
      (5L, 10L, 1.0)))
  }

  test("q328: a deterministic chain has zero entropy rate; 1 state guards") {
    val dir = tmpDir("graft_ent")
    // user 1: view->click->view->click (every from-state has ONE
    // destination -> all terms ln(1)=0); two from-states
    Seq((1L, hm(0), 1L, "view", 1.0), (2L, hm(1), 1L, "click", 1.0),
        (3L, hm(2), 1L, "view", 1.0), (4L, hm(3), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q328_entropy_rate")(spark, dir)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3 == 0.0, s"deterministic chain entropy ${r._3}")
    assert(r._5 == Some(0.0))

    // single from-state: 3 views then a click from user 2 only ever
    // transitions out of 'view' -> max_entropy ln(1)=0 -> normalized null
    val dir2 = tmpDir("graft_ent1")
    Seq((1L, hm(0), 2L, "view", 1.0), (2L, hm(1), 2L, "view", 1.0),
        (3L, hm(2), 2L, "view", 1.0), (4L, hm(3), 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val g = Queries.queries("q328_entropy_rate")(spark, dir2)
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // counts: view->view x2, view->click x1; H = (2 ln(3/2) + ln 3)/3
    val t1 = r6(2.0 * math.log(1.5))
    val t2 = r6(math.log(3.0))
    assert(g._1 == 3L && g._2 == 1L && g._4 == 0.0 && g._5.isEmpty)
    assert(g._3 == r6(r6(t1 + t2) / 3.0))
  }

  test("q329: consecutive baskets pair up; same-basket and gap pairs don't") {
    val dir = tmpDir("graft_seq")
    Seq((10L, 1L, hm(0)), (20L, 1L, hm(60)), (30L, 1L, hm(120)),
        (40L, 2L, hm(0)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 10: parts 1,2 (1 twice -> distinct); 20: part 3; 30: parts 4,5;
    // 40: customer 2's only order -> contributes nothing
    Seq((10L, 1L), (10L, 1L), (10L, 2L), (20L, 3L), (30L, 4L), (30L, 5L),
        (40L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q329_sequential_copurchase")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // (10->20): 1->3, 2->3; (20->30): 3->4, 3->5; ties rank by (a, b)
    assert(r == Seq((1L, 1L, 3L, 1L), (2L, 2L, 3L, 1L),
      (3L, 3L, 4L, 1L), (4L, 3L, 5L, 1L)))
  }
}
