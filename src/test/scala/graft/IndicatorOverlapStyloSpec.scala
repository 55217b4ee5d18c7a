package graft

import org.scalatest.funsuite.AnyFunSuite

/** q362–q367: average precision, ATR, RSI, interval-overlap join,
  * Burrows' Delta, trimmed/winsorized means — fixtures small enough to
  * fold by hand (score-tie blocks, partial windows, cell-boundary
  * intervals, and an empty-trim edge all planted).
  */
class IndicatorOverlapStyloSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(k: Long): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(k))

  private def writeEvents(dir: String,
                          rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q362: tied scores fold as one block — AP over {3$:1/2, 2$:0, 1$:1/2} is 0.5") {
    val dir = tmpDir("graft_ap")
    // dollar block 3: 2 rows 1 positive (P=1/2); block 2: pure negative;
    // block 1: positive (cum P=2/4). AP = (1·½ + 0 + 1·½)/2 = 0.5.
    writeEvents(dir, Seq(
      (1L, t(0), 0L, "purchase", 3.10), (2L, t(1), 0L, "view", 3.50),
      (3L, t(2), 0L, "view", 2.20), (4L, t(3), 0L, "purchase", 1.00)))
    val r = Queries.queries("q362_average_precision")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(r == ((2L, 3L, 0.5)))
  }

  test("q363: 15 hourly bars of constant TR=1.00 give one full window; close is last-by-(ts,id)") {
    val dir = tmpDir("graft_atr")
    val hr = 3600L
    // A: hours 0-12 alternate 2.00/3.00 (TR=1.00 each); hour 13 holds two
    // events — the LATER one (3.00) must be the close or TR14 breaks;
    // hour 14 returns to 2.00. 14 TRs of 100c → exactly one full window.
    val a = (0 to 12).map(h =>
      (h + 1L, t(h * hr), 0L, "A", if (h % 2 == 0) 2.00 else 3.00)) ++ Seq(
      (20L, t(13 * hr), 0L, "A", 2.60), (21L, t(13 * hr + 60), 0L, "A", 3.00),
      (22L, t(14 * hr), 0L, "A", 2.00))
    // B: 3 bars only — no full 14-window, so B must not appear at all.
    val b = (0 to 2).map(h => (30 + h.toLong, t(h * hr), 0L, "B", 5.00))
    writeEvents(dir, a ++ b)
    val rows = Queries.queries("q363_atr")(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.toSeq == Seq(("A", 1L, 1.0, 1.0)))
  }

  test("q364: monotone runs classify by the integer 3G≥7L forms; flat windows count in neither") {
    val dir = tmpDir("graft_rsi")
    // A: 16 up-ticks (+10c) → 15 diffs, 2 full windows, RSI 100 both.
    // B: 16 down-ticks → 2 oversold windows, max RSI 0.
    // C: 15 flat ticks → 1 window with G+L=0 → neither bucket, NULL max.
    val a = (0 to 15).map(k => (k + 1L, t(k), 0L, "A", 1.00 + 0.10 * k))
    val b = (0 to 15).map(k => (k + 101L, t(k), 0L, "B", 5.00 - 0.10 * k))
    val c = (0 to 14).map(k => (k + 201L, t(k), 0L, "C", 2.00))
    writeEvents(dir, a ++ b ++ c)
    val got = Queries.queries("q364_rsi")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) == 2L && got("A").getLong(2) == 2L
      && got("A").getLong(3) == 0L && got("A").getDouble(4) == 100.0)
    assert(got("B").getLong(1) == 2L && got("B").getLong(2) == 0L
      && got("B").getLong(3) == 2L && got("B").getDouble(4) == 0.0)
    assert(got("C").getLong(1) == 1L && got("C").getLong(2) == 0L
      && got("C").getLong(3) == 0L && got("C").isNullAt(4))
  }

  test("q365: overlapping day intervals pair exactly; a touching pair contributes 0 seconds") {
    val dir = tmpDir("graft_iov")
    val hr = 3600L
    // user1 [00:00,01:00], user2 [10:00,12:00] (crosses the 6h-cell
    // boundary at 12:00), user3 {20:00} — a degenerate point interval.
    // X = [00:00,12:00] overlaps u1 (3600 s) and u2 (7200 s), not u3;
    // Y = {20:00} touches only u3, with zero measure.
    writeEvents(dir, Seq(
      (1L, t(0), 1L, "X", 1.00), (2L, t(1 * hr), 1L, "X", 1.00),
      (3L, t(10 * hr), 2L, "X", 1.00), (4L, t(12 * hr), 2L, "X", 1.00),
      (5L, t(20 * hr), 3L, "Y", 1.00)))
    val got = Queries.queries("q365_interval_overlap")(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("X") == (("X", 2L, 10800.00)))
    assert(got("Y") == (("Y", 1L, 0.00)))
  }

  test("q366: two-word stylometry — z-grid {0,±√(3/2)} gives Δ(A,B)=Δ(A,C)=½Δ(B,C)") {
    val dir = tmpDir("graft_delta")
    // f_x per source: A ½, B ¾, C ¼ (f_y mirrors). μ=½, σ=√(1/24) both
    // words → z ∈ {0, ±1.224745}; Δ(A,B)=Δ(A,C)=1.224745, Δ(B,C)=2·that.
    Seq((1L, "x x y y", "A"), (2L, "x x x y", "B"), (3L, "x y y y", "C"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.queries("q366_burrows_delta")(spark, dir)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 3)
    assert(math.abs(got(("A", "B")) - 1.224745) < 1e-9)
    assert(math.abs(got(("A", "C")) - 1.224745) < 1e-9)
    assert(math.abs(got(("B", "C")) - 2.449490) < 1e-9)
  }

  test("q367: deciles trim exactly one tail row each; an all-outlier tiny group goes NULL") {
    val dir = tmpDir("graft_trim")
    // A = {1..9, 20} dollars: p10=1.90, p90=10.10 → trim {1.00, 20.00};
    // trimmed = 44.00/8 = 5.50, winsorized = (440+19+101)/100 = 5.60.
    // B = {1.00, 3.00}: p10=1.20, p90=2.80 exclude BOTH rows → NULL means.
    val a = ((1 to 9).map(_.toDouble) :+ 20.0).zipWithIndex.map {
      case (v, i) => (i + 1L, t(i.toLong), 0L, "A", v)
    }
    writeEvents(dir, a ++ Seq(
      (50L, t(50), 0L, "B", 1.00), (51L, t(51), 0L, "B", 3.00)))
    val got = Queries.queries("q367_trimmed_mean")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) == 10L && got("A").getDouble(2) == 5.5
      && got("A").getDouble(3) == 5.6)
    assert(got("B").getLong(1) == 2L && got("B").isNullAt(2)
      && got("B").isNullAt(3))
  }
}
