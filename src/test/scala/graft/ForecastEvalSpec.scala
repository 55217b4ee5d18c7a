package graft

import org.scalatest.funsuite.AnyFunSuite

/** q339–q342: forecast scorecard, split-conformal interval, eigenvector
  * centrality, McNemar — fixtures with closed forms (a pure period-24
  * series, 19 distinct calibration residuals, a 4-node star replayed
  * step-by-step, a hand confusion pairing).
  */
class ForecastEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def hourT(h: Int, k: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      "2024-01-01T00:00:00Z").plusSeconds(3600L * h + k))

  private def dayT(d: Int, k: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      f"2024-01-${d + 1}%02dT00:00:00Z").plusSeconds(k.toLong))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q339: a pure period-24 series scores zero seasonal error, MASE 0") {
    val dir = tmpDir("graft_fc")
    // counts (h%24)+1 over 48 hours: y_t == y_{t-24} exactly
    val rows = (0 until 48).flatMap { h =>
      (0 to h % 24).map(k => (h * 100L + k, hourT(h, k), 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q339_forecast_eval")(spark, dir)
      .as[(Long, Double, Double, Option[Double])].collect().head
    assert(r == ((24L, 0.0, 0.0, Some(0.0))))
  }

  test("q340: 19 distinct residuals select the 18th order statistic") {
    val dir = tmpDir("graft_conf")
    // ref (day 0): cents 100 and 300 -> mean 200; cal (day 20): cents
    // 210..390 step 10 -> scores 10..190, k = ceil(0.9*20) = 18
    val ref = Seq((1L, dayT(0, 0), 1L, "view", 1.0),
      (2L, dayT(0, 1), 1L, "view", 3.0))
    val cal = (1 to 19).map(i =>
      (100L + i, dayT(20, i), 1L, "view", 2.0 + i * 0.1))
    writeEvents(dir, ref ++ cal)
    val r = Queries.queries("q340_conformal_interval")(spark, dir)
      .as[(Long, Double, Double)].collect().head
    assert(r == ((19L, 180.0, r6(18.0 / 19.0))))
  }

  test("q341: the 4-node star replays the 3-step normalized power iteration") {
    val dir = tmpDir("graft_eig")
    Seq((100L, 1L), (101L, 1L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, 10L), (101L, 20L), (102L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.queries("q341_eigenvector_centrality")(spark, dir)
      .as[(Long, Double)].collect().toMap
    // replay: adjacency 1~{s10,s20}, 2~{s10}; x0 = 1
    var x = Map(1L -> 1.0, 2L -> 1.0, 1000010L -> 1.0, 1000020L -> 1.0)
    val nbr = Map(
      1L -> Seq(1000010L, 1000020L), 2L -> Seq(1000010L),
      1000010L -> Seq(1L, 2L), 1000020L -> Seq(1L))
    for (_ <- 1 to 3) {
      val raw = nbr.map { case (n, ns) => n -> r8(ns.map(x).sum) }
      val m = raw.values.max
      x = raw.map { case (n, v) => n -> r8(v / m) }
    }
    assert(got == x.map { case (n, v) =>
      n -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble })
    assert(got(1L) == 1.0 && got(1000010L) == 1.0)
    assert(got(2L) < 1.0 && got(2L) == got(1000020L))
  }

  test("q342: one discordant pair each way gives the 1/(b+c) correction") {
    val dir = tmpDir("graft_mcn")
    writeEvents(dir, Seq(
      (1L, hourT(0, 0), 1L, "purchase", 200.0),
      (2L, hourT(0, 1), 1L, "purchase", 120.0), // A right, B wrong
      (3L, hourT(0, 2), 1L, "view", 120.0),     // A wrong, B right
      (4L, hourT(0, 3), 1L, "view", 50.0),
      (5L, hourT(0, 4), 1L, "purchase", 50.0)))
    val r = Queries.queries("q342_mcnemar")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect().head
    assert(r == ((5L, 1L, 1L, 0.6, 0.6, Some(0.5))))
  }
}
