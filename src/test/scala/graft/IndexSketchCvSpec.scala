package graft

import org.scalatest.funsuite.AnyFunSuite

/** q347–q352: phrase search over positional postings, sufficient-statistic
  * k-fold CV, isotonic (PAV) calibration, URL decomposition, HTML
  * stripping, OHLC/VWAP bars — fixtures with hand-checkable outcomes
  * (planted phrases, perfectly linear folds, a poolable rate violation,
  * a single-URL host, a counted tag soup, a tied-timestamp open).
  */
class IndexSketchCvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(k: Int): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(k.toLong))

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, tx) => (id, tx, "en", "srcA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q347: adjacency is ordered — 'table hash' matches, 'hash table' does not") {
    val dir = tmpDir("graft_phrase")
    writeDocs(dir, Seq(
      (1L, "table hash table hash"), // two hits
      (2L, "table x hash"),          // gap — no hit
      (3L, "hash table"),            // reversed — no hit
      (4L, "x table hash y")))       // one hit mid-doc
    val got = Queries.queries("q347_phrase_search")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 1L)))
  }

  test("q348: perfectly linear folds recover slope 2 / intercept 0 / rmse 0") {
    val dir = tmpDir("graft_cv")
    // fold = (l_orderkey + l_linenumber) % 5; plant y = 2x exactly in
    // folds 0 and 1 so every out-of-fold fit is (2, 0) and residuals
    // vanish.
    Seq(
      (5L, 0, 1.0, 2.0), (10L, 0, 2.0, 4.0), (15L, 0, 3.0, 6.0), // fold 0
      (5L, 1, 4.0, 8.0), (10L, 1, 5.0, 10.0))                    // fold 1
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.queries("q348_cv_ols")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(got == Set((0L, 3L, 2.0, 0.0, 0.0), (1L, 2L, 2.0, 0.0, 0.0)))
  }

  test("q349: violating adjacent bins pool to their joint rate; monotone stays") {
    val dir = tmpDir("graft_iso")
    // bin 0 (cents 100): rate 1/2; bin 1 (cents 1000): rate 0/2 —
    // a violation, PAV pools both to 1/4. bin 2 (cents 2000): rate 1/1
    // is already above the pool and stays.
    Seq(
      (1L, t(0), 0L, "purchase", 1.00), (2L, t(1), 0L, "view", 1.00),
      (3L, t(2), 0L, "view", 10.00), (4L, t(3), 0L, "view", 10.00),
      (5L, t(4), 0L, "purchase", 20.00)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.queries("q349_isotonic_calibration")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 2L, 1L, 500000L, 250000L),
      (1L, 2L, 0L, 0L, 250000L),
      (2L, 1L, 1L, 1000000L, 1000000L)))
    // the fitted map is non-decreasing in bin order
    val fits = Queries.queries("q349_isotonic_calibration")(spark, dir)
      .orderBy("bin").select("iso_e6").as[Long].collect()
    assert(fits.sameElements(fits.sorted))
  }

  test("q350: host and registered domain decompose; avg_ref replays") {
    val dir = tmpDir("graft_url")
    writeDocs(dir, (0L until 7L).map(i => (i, s"doc $i")))
    val got = Queries.queries("q350_url_parse")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSet
    // ref = doc_id % 7 = 0..6 → avg 3.0
    assert(got == Set(("www.srcA.example.com", "example.com", 7L, 1L, 3.0)))
  }

  test("q351: tag count and cleaned length replay on a one-doc soup") {
    val dir = tmpDir("graft_html")
    writeDocs(dir, Seq((1L, "fast table")))
    // html = <html><body data-src="srcA"><h1>Doc 1</h1><p>&amp;fast
    //        <b>table</b></p></body></html> → 10 '<'
    // clean = "Doc 1&fast table" → 16 chars
    val got = Queries.queries("q351_html_strip")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == Set(("srcA", 1L, 10L, 16.0)))
  }

  test("q352: tied-timestamp open resolves by event_id; bars bucket hourly") {
    val dir = tmpDir("graft_vwap")
    Seq(
      (2L, t(5), 0L, "view", 3.00),   // hour 0, tied ts — open (lower id)
      (3L, t(5), 0L, "view", 1.00),   // hour 0, tied ts
      (1L, t(10), 0L, "view", 1.00),  // hour 0
      (4L, t(20), 0L, "view", 9.99),  // hour 0 close/high
      (5L, t(3700), 9L, "view", 2.00) // hour 1, qty 10
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val h0 = 1704067200L / 3600
    val got = Queries.queries("q352_vwap_bars")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // vwap_e6 = cents/qty-weighted mean × 10000 (micro-dollars)
      (h0, 300L, 999L, 100L, 999L, 4L, 3747500L), // (300+100+100+999)/4
      (h0 + 1, 200L, 200L, 200L, 200L, 10L, 2000000L)))
  }
}
