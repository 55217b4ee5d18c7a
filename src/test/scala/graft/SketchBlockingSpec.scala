package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: Count-Min sketch, sorted-neighborhood blocking,
  * skip-gram PPMI, chunk-level exact dedup (q217-q220). */
class SketchBlockingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --------------------------------------------------- q217 Count-Min

  test("CMS estimates are upper bounds of exact counts and deterministic") {
    val out = Queries.queries("q217_cms_freq")(spark, TestSpark.sf0001)
      .select("key", "exact_cnt", "cms_est")
      .as[(String, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.forall { case (_, exact, est) => est >= exact },
      "CMS must never under-estimate")
    val again = Queries.queries("q217_cms_freq")(spark, TestSpark.sf0001)
      .as[(String, Long, Long)].collect()
    assert(out.toSet == again.toSet, "md5 hashing must be run-stable")
  }

  // ------------------------------------- q218 sorted neighborhood

  test("banded neighborhood join equals the naive global-window range join") {
    val got = Queries.queries("q218_sorted_neighborhood")(spark, TestSpark.sf0001)
      .as[(Long, Long, Double)].collect().toSet
    // Naive replay: one global row_number, direct rank-range theta-join.
    val k = Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z]", ""), 1, 40).as("nk"))
    val r = k.withColumn("rn",
      row_number().over(Window.orderBy(col("nk"), col("doc_id"))))
    val naive = r.select(col("doc_id").as("doc_a"), col("nk").as("ka"), col("rn").as("ra"))
      .join(r.select(col("doc_id").as("doc_b"), col("nk").as("kb"), col("rn").as("rb")),
        col("rb") > col("ra") && col("rb") <= col("ra") + 10)
      .withColumn("sim", round(graft.functions.JaroWinkler(col("ka"), col("kb")), 4))
      .filter(col("sim") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("sim"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty && got.forall { case (a, b, s) => a != b && s >= 0.9 && s <= 1.0 })
  }

  // ------------------------------------------- q219 skip-gram PPMI

  test("zip_with skip-gram pair counts equal a positional self-join") {
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val naive = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 3)
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("cxy"))
    val viaQuery = Queries.queries("q219_skipgram_ppmi")(spark, TestSpark.sf0001)
      .select("w1", "w2", "cxy")
    // Every surviving (w1, w2, cxy) in the query must match the naive count.
    val mismatches = viaQuery.join(naive, Seq("w1", "w2"), "left")
      .filter(viaQuery("cxy") =!= naive("cxy") || naive("cxy").isNull)
      .count()
    assert(mismatches == 0)
    val rows = viaQuery.count()
    assert(rows > 0 && rows <= 50)
    val ppmis = Queries.queries("q219_skipgram_ppmi")(spark, TestSpark.sf0001)
      .select("ppmi").as[Double].collect()
    assert(ppmis.forall(_ > 0), "PPMI keeps only positive PMI")
  }

  // --------------------------------------------- q220 chunk dedup

  test("chunk dedup: counts are ceil(n/16), keepers one per distinct chunk") {
    val out = Queries.queries("q220_chunk_dedup")(spark, TestSpark.sf0001)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val joined = out.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"), col("n"))
      .as[(Long, Long, Long, Int)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nc, nk, n) =>
      assert(nc == (n + 15) / 16, s"doc $id chunk count")
      assert(nk >= 1 && nk <= nc, s"doc $id keeper bounds")
    }
    assert(joined.exists { case (_, nc, nk, _) => nk < nc },
      "sf0.001 corpus has duplicated chunks; some doc must lose one")
    // Global invariant: total keepers == number of distinct chunks.
    val totalKept = joined.map(_._3).sum
    val nDistinct = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(posexplode(expr(
        """transform(sequence(0, (size(t) - 1) DIV 16), i ->
          |  array_join(slice(t, i * 16 + 1, 16), ' '))""".stripMargin)).as(Seq("idx", "chunk")))
      .select("chunk").distinct().count()
    assert(totalKept == nDistinct)
  }

  test("chunk dedup: keep-first is exact far past 16 and 1024 chunks/doc") {
    // the two latent seams the r10 verdict flagged: a 16-chunk oracle
    // grid would never see chunk #1030, and a packed doc_id*1024+idx
    // keeper key would corrupt the keep-first order past 1024 chunks.
    // min(struct(doc_id, idx)) is exact at any count — pin it.
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    val base = (0 until 1040).flatMap(c => (0 until 16).map(t => s"c${c}t$t"))
    val dup = base.slice(1030 * 16, 1031 * 16) // doc 1's chunk idx 1030
    Seq((1L, base.mkString(" ")), (2L, dup.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.queries("q220_chunk_dedup")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1040L, 1040L, 1.0)), s"long doc keeps all: ${out(1L)}")
    assert(out(2L) == ((1L, 0L, 0.0)), s"high-idx dup must lose: ${out(2L)}")
  }
}
