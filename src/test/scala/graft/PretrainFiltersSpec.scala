package graft

import graft.dedup.RepeatedSpans
import graft.text.{Dsir, LmQuality, Pii}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pretraining-filter operators: cross-doc repeated spans
  * (ExactSubstr-lite), DSIR importance weights, CCNet LM-quality
  * terciles, and the PII redaction sweep. */
class PretrainFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // -------------------------------------------------- repeated spans

  test("repeated spans: shared 7-token run found at 5-gram resolution") {
    // docs 1 and 2 share tokens 'a b c d e f g' (7 tokens → three 5-gram
    // positions → one island, span length 3 + 4 = 7); doc 3 is disjoint
    val docs = Seq(
      (1L, "a b c d e f g x1 y1 z1"),
      (2L, "p2 q2 a b c d e f g"),
      (3L, "u v w aa bb cc dd ee ff gg")).toDF("doc_id", "text")
    val r = RepeatedSpans.perDoc(docs, "text", "doc_id", k = 5, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 3L, 0L)) // n_dup_grams
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L, 0L)) // n_spans
    assert(r.map(_.getLong(3)).toSeq == Seq(7L, 7L, 0L)) // max_span_tokens
  }

  test("repeated spans: two separate shared runs give two islands") {
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 m1 m2 m3 t1 t2 t3 t4 t5"),
      (2L, "s1 s2 s3 s4 s5 n1 n2 n3 t1 t2 t3 t4 t5"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9")).toDF("doc_id", "text")
    val r = RepeatedSpans.perDoc(docs, "text", "doc_id", k = 5, minDocs = 2)
      .filter($"doc_id" === 1L).collect()(0)
    assert(r.getLong(2) == 2L)          // two spans
    assert(r.getLong(3) == 5L)          // each exactly 5 tokens
    assert(r.getLong(1) == 2L)          // one duplicated gram per run
  }

  test("repeated spans: doc shorter than k yields zeros, not a dropped row") {
    val docs = Seq((1L, "a b"), (2L, "c d e f g h")).toDF("doc_id", "text")
    val r = RepeatedSpans.perDoc(docs, "text", "doc_id", k = 5, minDocs = 2)
    assert(r.count() == 2)
    assert(r.agg(sum("n_dup_grams")).as[Long].head() == 0L)
  }

  test("repeated spans: shuffled-hash fallback (gate forced shut) is " +
    "bit-identical to the broadcast path") {
    val docs = Seq(
      (1L, "a b c d e f g x1 y1 z1"),
      (2L, "p2 q2 a b c d e f g"),
      (3L, "a b c d e f q9 q8 q7"),
      (4L, "u v w aa bb cc dd ee ff gg")).toDF("doc_id", "text")
    val bc = RepeatedSpans.perDoc(docs, "text", "doc_id", k = 5, minDocs = 2)
      .orderBy("doc_id").collect().toSeq
    val key = "spark.graft.dedup.broadcastMaxBytes"
    spark.conf.set(key, "1")
    try {
      val shj = RepeatedSpans.perDoc(docs, "text", "doc_id", k = 5, minDocs = 2)
        .orderBy("doc_id").collect().toSeq
      assert(shj == bc)
    } finally spark.conf.unset(key)
  }

  // ------------------------------------------------------------ DSIR

  test("DSIR: target-vocabulary docs outrank off-target docs; topK respected") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha beta alpha beta gamma", "raw"),   // target-like wording
      (3L, "delta epsilon zeta eta theta", "raw"),  // disjoint vocabulary
      (4L, "alpha delta beta epsilon gamma", "raw")) // mixed
      .toDF("doc_id", "text", "source")
    val r = Dsir.importanceWeights(docs, "text", "doc_id",
      col("source") === "tgt", topK = 2)
      .orderBy(desc("weight"), asc("doc_id")).collect()
    val ids = r.map(_.getLong(0)).toSeq
    // target doc 1 and its twin 2 carry the highest weights
    assert(ids.take(2).toSet == Set(1L, 2L))
    assert(r.count(_.getBoolean(2)) == 2)
  }

  test("DSIR: selected is exactly the topK boundary under the total order") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val r = Dsir.importanceWeights(docs, "text", "doc_id",
      col("source") === "src0", topK = 10)
    assert(r.filter(col("selected")).count() == 10)
    val minSel = r.filter(col("selected"))
      .agg(min(struct((-col("weight")).as("nw"), col("doc_id").as("id"))))
    val maxUnsel = r.filter(!col("selected"))
      .agg(max(col("weight"))).as[Double].head()
    val minSelW = r.filter(col("selected")).agg(min(col("weight"))).as[Double].head()
    assert(maxUnsel <= minSelW)
  }

  // ----------------------------------------------------- CCNet terciles

  test("CCNet buckets partition the corpus; keep == not tail") {
    val r = LmQuality.ccnetBuckets(
      Tables.documents(spark, TestSpark.sf0001), "text", "doc_id")
    val counts = r.groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("head", "middle", "tail"))
    assert(counts.values.sum == 500L)
    // terciles: no bucket grossly dominates
    assert(counts.values.forall(c => c > 100 && c < 250))
    assert(r.filter(col("keep") =!= (col("bucket") =!= "tail")).count() == 0)
    // head scores ≥ tail scores
    val headMin = r.filter($"bucket" === "head").agg(min("score")).as[Double].head()
    val tailMax = r.filter($"bucket" === "tail").agg(max("score")).as[Double].head()
    assert(headMin >= tailMax)
  }

  // ----------------------------------------------------- containment

  test("containment: short doc inside long doc found; Jaccard would miss it") {
    val quote = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, quote),                                            // the quoted doc
      (2L, s"w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 $quote x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (3L, "p q r s t u v")).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.containmentPairs(docs, "text", "doc_id",
      k = 3, threshold = 0.8).collect()
    // doc 1's three 3-grams are all inside doc 2 → containment(1 in 2) = 1
    val row = r.find(x => x.getLong(0) == 1L && x.getLong(1) == 2L)
    assert(row.isDefined, s"missing (1,2) in ${r.mkString(",")}")
    assert(row.get.getDouble(3) == 1.0)
    // the reverse direction does NOT qualify (doc 2 is much larger)
    assert(!r.exists(x => x.getLong(0) == 2L && x.getLong(1) == 1L))
    // and the symmetric Jaccard at the same threshold finds nothing
    val jac = graft.dedup.Dedup.ngramJaccardSelfPairs(docs, "text", "doc_id",
      k = 3, threshold = 0.8)
    assert(jac.isEmpty)
  }

  test("containment: prefix-filtered join matches the naive postings join") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val fast = graft.dedup.Dedup.containmentPairs(docs, "text", "doc_id",
      k = 3, threshold = 0.8).select("id_a", "id_b", "shared")
    val naive = {
      val t = docs.select(col("doc_id"),
          graft.text.Text.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), array_distinct(
          graft.text.Text.shingleHashes(col("__toks"), 3)).as("g"))
        .filter(size(col("g")) > 0)
      val sz = t.select(col("doc_id").as("id_a"), size(col("g")).as("sa"))
      val p = t.select(col("doc_id"), explode(col("g")).as("sh"))
      p.select(col("doc_id").as("id_a"), col("sh"))
        .join(p.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .join(sz, "id_a")
        .filter(col("shared").cast("double") / col("sa") >= 0.8)
        .select("id_a", "id_b", "shared")
    }
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  // -------------------------------------------- novelty / leakage folds

  test("source novelty: src0 is all-novel and ratios decay to a positive floor") {
    val r = Queries.queries("q189_source_novelty")(spark, TestSpark.sf0001)
      .orderBy("source_rank").collect()
    assert(r.length == 20)
    assert(r.head.getDouble(4) == 1.0)                 // src0: everything novel
    assert(r.last.getDouble(4) < r.head.getDouble(4))  // later sources add less
    assert(r.forall(_.getDouble(4) >= 0.0))
    // novel ≤ distinct for every source
    assert(r.forall(x => x.getLong(3) <= x.getLong(2)))
  }

  test("leakage folds: every near-dup cluster lands in exactly one fold") {
    val r = Queries.queries("q190_leakage_folds")(spark, TestSpark.sf0001)
    assert(r.groupBy("canonical_id")
      .agg(countDistinct("fold").as("nf")).filter($"nf" > 1).count() == 0)
    assert(r.select("fold").distinct().count() > 1)  // folds actually spread
  }

  // ------------------------------------------------------------- PII

  test("PII sweep redacts emails, IPv4s, and phone groups in fixed order") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@foo-bar.org today"),
      (2L, "server 192.168.0.1 answered"),
      (3L, "call 555-0188 now"),
      (4L, "clean text with numbers 12345 intact"),
      (5L, "multi a@b.io and 10.0.0.7 and 555-1234")).toDF("id", "t")
    val r = df.select(col("id"), Pii.redact(col("t")).as("r"),
        Pii.matches(col("t"), Pii.EmailRe).as("ne"),
        Pii.matches(col("t"), Pii.Ipv4Re).as("ni"))
      .orderBy("id").collect()
    assert(r(0).getString(1) == "reach me at [EMAIL] today")
    assert(r(1).getString(1) == "server [IP] answered")
    assert(r(2).getString(1) == "call [PHONE] now")
    assert(r(3).getString(1) == "clean text with numbers 12345 intact")
    assert(r(4).getString(1) == "multi [EMAIL] and [IP] and [PHONE]")
    assert(r(0).getInt(2) == 1 && r(1).getInt(3) == 1)
  }

  test("q185 plants exactly one PII item per doc_id%5 in {0,1,2}") {
    val out = Queries.queries("q185_pii_redact")(spark, TestSpark.sf0001)
    val sums = out.agg(sum("n_emails"), sum("n_phones"), sum("n_ips"))
      .as[(Long, Long, Long)].head()
    assert(sums == ((100L, 100L, 100L)))
    // nothing redacted in the %5 ∈ {3,4} classes — the corpus is PII-free
    assert(out.filter(col("doc_id") % 5 >= 3)
      .filter(col("redacted").contains("[")).count() == 0)
  }
}
