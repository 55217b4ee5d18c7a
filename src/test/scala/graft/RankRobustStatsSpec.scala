package graft

import org.scalatest.funsuite.AnyFunSuite

/** q356–q361: Kruskal–Wallis, Brown–Forsythe Levene, Jarque–Bera,
  * Grubbs, max drawdown, Friedman — fixtures small enough to rank and
  * pool by hand (tie blocks included wherever the statistic has a tie
  * path).
  */
class RankRobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(k: Int): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(k.toLong))

  private def writeEvents(dir: String,
                          rows: Seq[(Long, java.sql.Timestamp, String, Double)]): Unit =
    rows.map { case (id, ts, typ, v) => (id, ts, 0L, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q356: untied ranks give H = 2.4; a cross-group tie corrects to 1.5") {
    val dir = tmpDir("graft_kw")
    // A = {1, 2}, B = {3, 4}: ranks 1..4, R_A = 3, R_B = 7 →
    // H = 12/20 · (9/2 + 49/2) − 15 = 2.4, no ties.
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 2.00),
      (3L, t(2), "B", 3.00), (4L, t(3), "B", 4.00)))
    val r1 = Queries.queries("q356_kruskal_wallis")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r1 == ((4L, 2L, 2.4)))
    // A = {1, 2}, B = {2, 3}: the tied 2s rank 2.5 → H = 1.35,
    // correction 1 − 6/60 = 0.9 → 1.5.
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 2.00),
      (3L, t(2), "B", 2.00), (4L, t(3), "B", 3.00)))
    val r2 = Queries.queries("q356_kruskal_wallis")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r2 == ((4L, 2L, 1.5)))
  }

  test("q357: hand ANOVA on |x − median| — W = 324/401") {
    val dir = tmpDir("graft_levene")
    // A = {1,2,3} (median 2, doubled devs 200,0,200);
    // B = {10,10,30} (median 10, devs 0,0,4000).
    // SSB = 2160000, SSW = 32080000/3 → W = 25920000/32080000 = 324/401.
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 2.00), (3L, t(2), "A", 3.00),
      (4L, t(3), "B", 10.00), (5L, t(4), "B", 10.00), (6L, t(5), "B", 30.00)))
    val r = Queries.queries("q357_levene_bf")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r._1 == 6L && r._2 == 2L)
    assert(math.abs(r._3 - 324.0 / 401.0) < 5e-7)
  }

  test("q358: symmetric 3-point series — skew 0, excess kurtosis −1.5") {
    val dir = tmpDir("graft_jb")
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 2.00), (3L, t(2), "A", 3.00)))
    val r = Queries.queries("q358_jarque_bera")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(r._1 == "A" && r._2 == 3L)
    assert(r._3 == 0.0)
    assert(r._4 == -1.5)
    // JB = n/6 · (0 + 1.5²/4) = 0.28125 up to the float path
    assert(math.abs(r._5 - 0.28125) < 1e-3)
  }

  test("q359: G names the far point; a dev tie resolves to the lower id") {
    val dir = tmpDir("graft_grubbs")
    // A = {1,2,3,10}: mean 4.00, max dev 6.00 at id 4,
    // s = sqrt(500000/3) cents → G = 600/408.248... = 1.469694.
    // T = {1,3}: both devs equal → id 10 (lower) wins; G = 100/sqrt(20000).
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 2.00),
      (3L, t(2), "A", 3.00), (4L, t(3), "A", 10.00),
      (10L, t(4), "T", 1.00), (11L, t(5), "T", 3.00)))
    val got = Queries.queries("q359_grubbs")(spark, dir)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 4L, 1.469694, 4L)))
    assert(got("T") == (("T", 2L, 0.707107, 10L)))
  }

  test("q360: peak-to-trough on a planted path is 2.50") {
    val dir = tmpDir("graft_dd")
    // path 1.00 → 3.00 → 2.00 → 0.50 → 2.50: peak 3.00, trough 0.50.
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "A", 3.00), (3L, t(2), "A", 2.00),
      (4L, t(3), "A", 0.50), (5L, t(4), "A", 2.50)))
    val r = Queries.queries("q360_max_drawdown")(spark, dir)
      .as[(String, Long, Double)].collect().head
    assert(r == (("A", 5L, 2.50)))
  }

  test("q361: perfect agreement over 3 complete blocks scores 6; ties average") {
    val dir = tmpDir("graft_friedman")
    val day = 86400
    // days 0,1,2: A < B < C throughout → χ² = 12/36·126 − 36 = 6.
    // day 3 lacks C → dropped (n_blocks stays 3).
    val rows = (0 until 3).flatMap { d =>
      Seq((d * 10 + 1L, t(d * day), "A", 1.00),
        (d * 10 + 2L, t(d * day + 1), "B", 2.00),
        (d * 10 + 3L, t(d * day + 2), "C", 3.00))
    } ++ Seq((91L, t(3 * day), "A", 9.00), (92L, t(3 * day + 1), "B", 9.00))
    writeEvents(dir, rows)
    val r = Queries.queries("q361_friedman")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r == ((3L, 3L, 6.0)))
    // single block, A and B tie at rank 1.5 →
    // χ² = 12/12 · (2.25 + 2.25 + 9) − 12 = 1.5.
    writeEvents(dir, Seq(
      (1L, t(0), "A", 1.00), (2L, t(1), "B", 1.00), (3L, t(2), "C", 2.00)))
    val r2 = Queries.queries("q361_friedman")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r2 == ((1L, 3L, 1.5)))
  }
}
