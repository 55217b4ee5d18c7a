package graft

import org.scalatest.funsuite.AnyFunSuite

/** q330–q334: Kendall τ-b, ACF + Ljung-Box, runs test, Mann–Kendall,
  * ROC AUC — each on a fixture whose statistic is a closed-form rational
  * (monotone daily series, a period-2 hourly wave, a 4-run sign pattern,
  * perfectly-separable and fully-tied score sets).
  */
class SeriesDiagnosticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def dayT(d: Int, k: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      f"2024-01-${d + 1}%02dT00:00:00Z").plusSeconds(k.toLong))

  private def hourT(h: Int, k: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      "2024-01-01T00:00:00Z").plusSeconds(3600L * h + k))

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q330: opposed monotone series with one x-tie hits -5/sqrt(30)") {
    val dir = tmpDir("graft_tau")
    // daily (clicks, purchases): (1,4) (2,3) (2,2) (3,1) -> 5 discordant
    // pairs, one x-tie, zero concordant
    val xs = Seq(1, 2, 2, 3); val ys = Seq(4, 3, 2, 1)
    val rows = (0 until 4).flatMap { d =>
      (0 until xs(d)).map(k =>
        (d * 100L + k, dayT(d, k), 1L, "click", 1.0)) ++
      (0 until ys(d)).map(k =>
        (d * 100L + 50 + k, dayT(d, k), 1L, "purchase", 1.0))
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q330_kendall_tau")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(r == ((6L, 0L, 5L, Some(r6(-5.0 / math.sqrt(30.0))))))
  }

  test("q331: a period-2 wave has acf (-1)^k (n-k)/n and closed-form Q") {
    val dir = tmpDir("graft_acf")
    // hourly counts 1,2,1,2,... over 8 hours: z alternates -/+4,
    // den = 128, num_k = (8-k) * 16 * (-1)^k -> acf_k = (-1)^k (8-k)/8
    val rows = (0 until 8).flatMap { h =>
      (0 until (if (h % 2 == 0) 1 else 2)).map(k =>
        (h * 10L + k, hourT(h, k), 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q331_acf_ljung_box")(spark, dir)
      .as[(Long, Option[Double], Double)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == (1L to 7L), "only lags with pairs appear")
    val acf = (1 to 7).map(k => (if (k % 2 == 0) 1 else -1) * (8.0 - k) / 8.0)
    assert(r.map(_._2.get) == acf)
    // Ljung-Box accumulates r^2/(n-k) in lag order: Q1 = 80*(49/64)/7,
    // Q2 = Q1 + 80*(36/64)/6, ...
    var acc = 0.0
    val wantQ = (1 to 7).map { k =>
      acc += acf(k - 1) * acf(k - 1) / (8.0 - k); r4(80.0 * acc) }
    assert(r.map(_._3) == wantQ)
  }

  test("q332: a 4-run sign pattern lands exactly on the expected mean") {
    val dir = tmpDir("graft_runs")
    // hourly counts 1,1,5,5,1,5 -> median 3, signs 001101 -> 4 runs;
    // n1=n2=3 -> mu=4, z=0 exactly
    val cs = Seq(1, 1, 5, 5, 1, 5)
    val rows = (0 until 6).flatMap { h =>
      (0 until cs(h)).map(k => (h * 10L + k, hourT(h, k), 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q332_runs_test")(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(r == ((3L, 3L, 4L, Some(0.0))))
  }

  test("q333: a strictly increasing daily series has S=10, var=50/3") {
    val dir = tmpDir("graft_mk")
    val rows = (0 until 5).flatMap { d =>
      (0 to d).map(k => (d * 100L + k, dayT(d, k), 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q333_mann_kendall")(spark, dir)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(r._1 == 5L && r._2 == 10L)
    assert(r._3 == r4(50.0 / 3.0))
    assert(r._4 == Some(r4(9.0 / math.sqrt(50.0 / 3.0))))
  }

  test("q334: separable scores give AUC 1, fully tied scores give 0.5") {
    val dir = tmpDir("graft_auc")
    writeEvents(dir, Seq(
      (1L, hourT(0, 0), 1L, "purchase", 2.0), (2L, hourT(0, 1), 1L, "purchase", 2.0),
      (3L, hourT(0, 2), 1L, "view", 1.0), (4L, hourT(0, 3), 1L, "view", 1.0),
      (5L, hourT(0, 4), 1L, "view", 1.0)))
    val a = Queries.queries("q334_roc_auc")(spark, dir)
      .as[(Long, Long, Option[Double])].collect().head
    assert(a == ((2L, 3L, Some(1.0))))

    val dir2 = tmpDir("graft_auc2")
    writeEvents(dir2, Seq(
      (1L, hourT(0, 0), 1L, "purchase", 1.0), (2L, hourT(0, 1), 1L, "purchase", 1.0),
      (3L, hourT(0, 2), 1L, "view", 1.0), (4L, hourT(0, 3), 1L, "view", 1.0),
      (5L, hourT(0, 4), 1L, "view", 1.0)))
    val b = Queries.queries("q334_roc_auc")(spark, dir2)
      .as[(Long, Long, Option[Double])].collect().head
    assert(b == ((2L, 3L, Some(0.5))), "midranks make ties exactly chance")
  }
}
