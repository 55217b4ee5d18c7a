package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 lexical retrieval + the corpus-statistics quality scorers
  * (q122-q125). */
class RetrievalScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- BM25

  test("BM25: hand-computed score on a three-doc corpus") {
    val docs = Seq((1L, "a b"), (2L, "a a b"), (3L, "c c")).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("a"), 10)
      .select("doc_id", "score", "rnk").as[(Long, Double, Long)].collect()
      .sortBy(_._3)
    // N=3, total=7, avgdl=7/3, df(a)=2 → idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    val avgdl = 7.0 / 3
    def tfn(tf: Long, dl: Long) =
      tf * (1.2 + 1.0) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def exp(tf: Long, dl: Long) =
      BigDecimal(idf * tfn(tf, dl)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d2 (tf=2, dl=3) outranks d1 (tf=1, dl=2); d3 doesn't match
    assert(out.map(_._1).toSeq == Seq(2L, 1L))
    assert(out(0)._2 == exp(2, 3) && out(1)._2 == exp(1, 2))
  }

  test("BM25 term-frequency saturation: doubling tf gains less than 2x") {
    // same dl, tf 1 vs 2 vs 4 of the query term
    val docs = Seq((1L, "a x x x x x x x"), (2L, "a a x x x x x x"),
      (3L, "a a a a x x x x")).toDF("doc_id", "text")
    val s = Bm25.topK(docs, "doc_id", "text", Seq("a"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(s(2L) > s(1L) && s(3L) > s(2L), s"monotone in tf: $s")
    assert(s(2L) < 2 * s(1L) && s(3L) < 2 * s(2L), s"saturating in tf: $s")
  }

  test("BM25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq((1L, "a x"), (2L, "a x x x x x x x")).toDF("doc_id", "text")
    val s = Bm25.topK(docs, "doc_id", "text", Seq("a"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), s"length norm: $s")
  }

  // ------------------------------------------- per-source quality prune

  test("q295 QLD: hand-computed Dirichlet-smoothed scores, absent terms smoothed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qld").toString
    Seq((1L, "vector join scan"), (2L, "vector vector other other"),
        (3L, "noise noise noise"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.queries("q295_qld_retrieval")(spark, dir)
      .as[(Long, Double)].collect().toMap
    // ct=10, cf(vector)=3, cf(join)=1, cf(scan)=1, mu=2000
    def term(tf: Long, cf: Long, dl: Long) =
      math.log((tf + 2000.0 * cf / 10) / (dl + 2000.0))
    def exp(tfs: Seq[Long], dl: Long) =
      BigDecimal(term(tfs(0), 3, dl) + term(tfs(1), 1, dl) + term(tfs(2), 1, dl))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == exp(Seq(1, 1, 1), 3))
    assert(out(2L) == exp(Seq(2, 0, 0), 4))
    assert(out(3L) == exp(Seq(0, 0, 0), 3)) // pure smoothing, still scored
    assert(out(1L) > out(2L) && out(2L) > out(3L))
  }

  test("q123 quality prune drops exactly the bottom quartile per source") {
    // source u: dl 1..8 → quantile_cont(0.25) = 2.75 → keep n_tokens ≥ 3
    val docs = (1 to 8).map(i => (i.toLong, "u", Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val dir = s"/tmp/graft-test-prune-${System.nanoTime()}"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = Queries.queries("q123_quality_prune")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (3L to 8L).toSet)
  }

  // ------------------------------------------------- cluster keep-best

  test("q124 keeps the max-n_chars doc per cluster and covers the corpus") {
    val out = Queries.queries("q124_cluster_best")(spark, TestSpark.sf0001)
      .select("canonical_id", "kept_doc_id", "kept_n_chars", "cluster_size")
      .as[(Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val nDocs = docs.count()
    assert(out.map(_._4).sum == nDocs, "cluster sizes partition the corpus")
    // brute replay via aggregation (different path than the window):
    // per cluster, the kept doc's n_chars is the cluster max
    val canon = graft.dedup.Dedup.canonicalizeExact(docs, "text", "doc_id")
    val maxByCluster = docs.join(canon, Seq("doc_id"))
      .groupBy("canonical_id").agg(max("n_chars").as("mx"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (cid, _, nc, _) =>
      assert(nc == maxByCluster(cid), s"cluster $cid kept $nc != max ${maxByCluster(cid)}")
    }
  }

  // --------------------------------------------------- unigram logprob

  test("unigram logprob: hand-computed on a two-doc corpus") {
    val docs = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val dir = s"/tmp/graft-test-lp-${System.nanoTime()}"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Queries.queries("q125_unigram_logprob")(spark, dir)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // total=4, freq(a)=3, freq(b)=1
    assert(got(1L) == r4(math.log(3.0 / 4)))
    assert(got(2L) == r4((math.log(3.0 / 4) + math.log(1.0 / 4)) / 2))
    // the rare-token doc is less probable
    assert(got(2L) < got(1L))
  }

  test("q310 MRR: a top-ranked single-occurrence doc is not relevant") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mrr").toString
    val filler = Seq.fill(20)("x").mkString(" ")
    Seq(
      (1L, "vector"),                      // tf=1, short -> ranks 1st, irrelevant
      (2L, s"vector vector $filler"),      // tf=2, long -> ranks 2nd, relevant
      (3L, "join"),                        // tf=1 only -> no relevant doc
      (4L, "scan scan"))                   // tf=2 -> rank 1 relevant
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q310_mrr")(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(r == Set(("vector", 2L, 0.5), ("join", 0L, 0.0),
      ("scan", 1L, 1.0)))
  }
}
