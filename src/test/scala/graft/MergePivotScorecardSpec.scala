package graft

import org.scalatest.funsuite.AnyFunSuite

/** q353–q355: MERGE-audit classification, multi-measure wide pivot, and
  * the end-to-end dedup quality scorecard — fixtures with hand-checkable
  * outcomes (one key per merge action, one event per time band, planted
  * duplicate clusters).
  */
class MergePivotScorecardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  test("q353: one key per action — update sums both sides, insert/retain one") {
    val dir = tmpDir("graft_merge")
    // key (1,1): before + after → update; (2,1): after only → insert;
    // (3,1): before only → retain; (1,2) shares part 1 but is its own
    // key → insert (proves the key is the PAIR, not the part).
    Seq(
      (1L, 1L, t("1997-01-01T00:00:00Z"), 10.00),
      (1L, 1L, t("1997-08-01T00:00:00Z"), 20.00),
      (2L, 1L, t("1997-08-02T00:00:00Z"), 5.00),
      (3L, 1L, t("1997-02-01T00:00:00Z"), 7.50),
      (1L, 2L, t("1997-09-01T00:00:00Z"), 2.00))
      .toDF("l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Queries.queries("q353_merge_audit")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("update", 1L, 1L, 1L, 30.00),
      ("insert", 2L, 0L, 2L, 7.00),
      ("retain", 1L, 1L, 0L, 7.50)))
  }

  test("q354: bands place by UTC time-of-day; empty cells are NULL") {
    val dir = tmpDir("graft_pivotm")
    Seq(
      (1L, t("2024-01-01T03:00:00Z"), 0L, "view", 1.00),     // band 0
      (2L, t("2024-01-01T09:00:00Z"), 0L, "view", 2.50),     // band 1
      (3L, t("2024-01-01T21:00:00Z"), 0L, "purchase", 10.00) // band 3
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Queries.queries("q354_pivot_multi")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val v = rows("view")
    assert(v.getLong(1) == 1L && v.getDouble(2) == 1.00)   // 0_cnt / 0_val
    assert(v.getLong(3) == 1L && v.getDouble(4) == 2.50)   // 1_cnt / 1_val
    assert(v.isNullAt(5) && v.isNullAt(6))                 // band 2 empty
    assert(v.isNullAt(7) && v.isNullAt(8))                 // band 3 empty
    val p = rows("purchase")
    assert(p.isNullAt(1) && p.isNullAt(3) && p.isNullAt(5))
    assert(p.getLong(7) == 1L && p.getDouble(8) == 10.00)
  }

  test("q355: planted triple clusters identically under LSH and exact truth") {
    val dir = tmpDir("graft_scorecard")
    // 1 and 3 are byte-identical (all LSH bands agree); 2 shares 5/6 of
    // their 2-shingles (J = 0.833 >= 0.3). 4 and 5 share no shingles with
    // anything. Truth = one cluster {1,2,3} → 3 co-membership pairs.
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six"),
      (5L, "red green blue cyan magenta yellow"))
      .map { case (id, tx) => (id, tx, "en", "srcA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.queries("q355_dedup_scorecard")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double, Long, Long)]
      .collect().toSeq
    assert(got == Seq((3L, 0L, 0L, 1.0, 1.0, 1.0, 1L, 1L)))
  }

  test("q355: an LSH-invisible duplicate shows up as a recall miss, not a crash") {
    val dir = tmpDir("graft_scorecard_fn")
    // 6 and 7 overlap in exactly 2 of their ~7 distinct 2-shingles
    // (J ≈ 0.17 < 0.3): NEITHER side pairs them — the scorecard must
    // report a clean zero-cluster corpus, with null rates (0/0).
    Seq(
      (6L, "alpha beta gamma delta epsilon zeta"),
      (7L, "alpha beta omega psi chi phi"),
      (8L, "one two three four five six"))
      .map { case (id, tx) => (id, tx, "en", "srcA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q355_dedup_scorecard")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 0L && r(0).getLong(1) == 0L
      && r(0).getLong(2) == 0L)
    assert(r(0).isNullAt(3) && r(0).isNullAt(4) && r(0).isNullAt(5))
    assert(r(0).getLong(6) == 0L && r(0).getLong(7) == 0L)
  }
}
