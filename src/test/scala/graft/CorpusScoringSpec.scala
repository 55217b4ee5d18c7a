package graft

import org.scalatest.funsuite.AnyFunSuite

/** q335–q338: bigram perplexity, Gumbel block maxima, reciprocal-rank
  * fusion, PSI drift — hand-computable fixtures (a 2-doc bigram corpus,
  * maxima {3,5,7}, a 3-doc retrieval corpus where one doc matches no
  * term, a mirrored 2-bucket drift).
  */
class CorpusScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def hourT(h: Int, k: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      "2024-01-01T00:00:00Z").plusSeconds(3600L * h + k))

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q335: add-one bigram probabilities recover the hand computation") {
    val dir = tmpDir("graft_bigram")
    // corpus bigrams: (a,b) x3, (b,a) x1 -> c1(a)=3, c1(b)=1, V=2
    Seq((1L, "a b a b"), (2L, "a b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q335_bigram_perplexity")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // doc 1: p(a,b)=4/5 twice, p(b,a)=2/3; doc 2: p(a,b)=4/5
    val lp1 = r4((2.0 * math.log(4.0 / 5.0) + math.log(2.0 / 3.0)) / 3.0)
    val lp2 = r4(math.log(4.0 / 5.0))
    assert(r == Seq((1L, 3L, lp1, r4(math.exp(-lp1))),
      (2L, 1L, lp2, r4(math.exp(-lp2)))))
  }

  test("q336: maxima {3,5,7} give mean 5, sd 2, and the moment-fit chain") {
    val dir = tmpDir("graft_gumbel")
    // day 0: hourly counts 1,3; day 1: 1,5; day 2: 1,7
    val counts = Seq((0, 1), (1, 3), (24, 1), (25, 5), (48, 1), (49, 7))
    val rows = counts.flatMap { case (h, c) =>
      (0 until c).map(k => (h * 100L + k, hourT(h, k), 1L, "view", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q336_gumbel_maxima")(spark, dir)
      .as[(Long, Double, Double, Double)].collect().head
    val beta = r6(2.0 * math.sqrt(6.0) / math.Pi)
    val mu = r6(5.0 - 0.5772156649015329 * beta)
    assert(r == ((3L, mu, beta, r4(mu + 4.600149226776579 * beta))))
  }

  test("q337: a term-less doc fuses on its QLD rank alone") {
    val dir = tmpDir("graft_rrf")
    // A: 3x 'vector' -> bm25 rank 1, qld rank 1; B: 1x -> rank 2 both;
    // C: no query term -> absent from bm25 (no posting), qld rank 3
    Seq((1L, "vector vector vector x"), (2L, "vector x x x"),
        (3L, "y y y y"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q337_rrf_fusion")(spark, dir)
      .as[(Long, Double, Option[Long], Option[Long])].collect().toSeq
    assert(r == Seq(
      (1L, r6(1.0 / 61 + 1.0 / 61), Some(1L), Some(1L)),
      (2L, r6(1.0 / 62 + 1.0 / 62), Some(2L), Some(2L)),
      (3L, r6(1.0 / 63), None, Some(3L))))
  }

  test("q338: a mirrored two-bucket shift yields the symmetric PSI") {
    val dir = tmpDir("graft_psi")
    def dayT(d: Int, k: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-01-${d + 1}%02dT00:00:00Z")
        .plusSeconds(k.toLong))
    // ref (day 0): 3 in bucket 0 (value 10), 1 in bucket 1 (value 60);
    // cur (day 20): mirrored
    val rows =
      (0 until 3).map(k => (k.toLong, dayT(0, k), 1L, "view", 10.0)) ++
      Seq((10L, dayT(0, 9), 1L, "view", 60.0)) ++
      Seq((20L, dayT(20, 0), 1L, "view", 10.0)) ++
      (0 until 3).map(k => (30L + k, dayT(20, k + 1), 1L, "view", 60.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q338_psi_drift")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().head
    // p0=4/6, q0=2/6 and the mirror: two equal terms (1/3)ln 2
    val t = r6((4.0 / 6 - 2.0 / 6) * math.log((4.0 / 6) / (2.0 / 6)))
    assert(r == ((4L, 4L, 2L, r4(t + t))))
  }
}
