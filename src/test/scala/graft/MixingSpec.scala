package graft

import graft.text.Mixing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf0001)

  test("temperatureMix: per-source sample counts equal the √-scaled targets") {
    val out = Mixing.temperatureMix(docs, "source", "doc_id", 60)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("got"), first("target_cnt").as("tgt"))
      .as[(String, Long, Long)].collect()
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, got, tgt) =>
      assert(got == tgt, s"source $src selected $got != target $tgt")
    }
    assert(bySrc.map(_._3).sum <= 60) // floors never exceed the budget
  }

  test("temperatureMix flattens the head source (τ=1/2 property)") {
    // sf0.001's sources are uniform (flattening would be a no-op there) —
    // use a skewed synthetic corpus: 800 head rows vs 100+100 tail
    val skewed = ((0 until 800).map(i => (i.toLong, "head")) ++
      (800 until 900).map(i => (i.toLong, "tailA")) ++
      (900 until 1000).map(i => (i.toLong, "tailB"))).toDF("doc_id", "source")
    val corpus = Map("head" -> 800L, "tailA" -> 100L, "tailB" -> 100L)
    val out = Mixing.temperatureMix(skewed, "source", "doc_id", 200)
    val sample = out.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val headCorpusShare = corpus("head").toDouble / corpus.values.sum
    val headSampleShare = sample("head").toDouble / sample.values.sum
    assert(headSampleShare < headCorpusShare,
      s"head source not flattened: sample $headSampleShare vs corpus $headCorpusShare")
    // and the flattening is toward, not past, uniform (√800:√100 ≈ 2.83:1)
    assert(headSampleShare > 1.0 / corpus.size)
  }

  test("temperatureMix is deterministic (md5 ranks, no RNG)") {
    val a = Mixing.temperatureMix(docs, "source", "doc_id", 60)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mixing.temperatureMix(docs, "source", "doc_id", 60)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("temperatureMixThreshold: selection is a subset-free map-side filter near the targets") {
    val exact = Mixing.temperatureMix(docs, "source", "doc_id", 60)
    val approx = Mixing.temperatureMixThreshold(docs, "source", "doc_id", 60)
    val tgt = exact.groupBy("source").agg(first("target_cnt").as("t"))
      .as[(String, Long)].collect().toMap
    val got = approx.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    tgt.foreach { case (src, t) =>
      val n = got.getOrElse(src, 0L)
      // Binomial(n_s, t/n_s): 4σ tolerance around the target
      val tol = math.max(4 * math.sqrt(t.toDouble), 4.0)
      assert(math.abs(n - t) <= tol, s"source $src: approx $n vs target $t (tol $tol)")
    }
  }
}
