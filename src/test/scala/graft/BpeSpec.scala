package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine-load-bearing semantics of the BPE merge
  * (text/Bpe.scala): the double-replace merge vector, a hand-computed
  * 2-round fixture, and structural invariants on the corpus. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("replace parity vector: left-to-right non-overlapping, double pass catches alternates") {
    // DuckDB: replace(' a b a b ', ' a b ', ' ab ') = ' ab a b ' (the
    // shared boundary space is consumed). The oracle relies on Spark's
    // replace doing EXACTLY the same, and on the second pass finishing
    // the job.
    val r = Seq(" a b a b ").toDF("s").select(
      expr("replace(s, ' a b ', ' ab ')").as("once"),
      expr("replace(replace(s, ' a b ', ' ab '), ' a b ', ' ab ')").as("twice"))
      .head()
    assert(r.getString(0) == " ab a b ", s"single-pass semantics drifted: [${r.getString(0)}]")
    assert(r.getString(1) == " ab ab ")
    // run-of-three: greedy L2R merges the first two, leaves the third
    val r2 = Seq(" a a a ").toDF("s").select(
      expr("replace(replace(s, ' a a ', ' aa '), ' a a ', ' aa ')").as("m")).head()
    assert(r2.getString(0) == " aa a ")
  }

  test("hand-computed 2-round fixture") {
    // corpus: "ab ab cd" -> freqs: ab:2, cd:1
    // round 1 pairs: 'a b':2, 'c d':1 -> best 'a b' (cnt 2), merge -> 'ab', 'c d'
    // round 2 pairs: 'c d':1 -> best 'c d' (cnt 1)
    val df = Seq("ab ab cd").toDF("text")
    val out = Bpe.merges(df, "text", rounds = 2)
      .orderBy("round").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "a b" &&
      out(0).getString(2) == "ab" && out(0).getLong(3) == 2L)
    assert(out(1).getLong(0) == 2L && out(1).getString(1) == "c d" &&
      out(1).getString(2) == "cd" && out(1).getLong(3) == 1L)
  }

  test("corpus invariants: rounds ordered, counts non-increasing-ish, merged = pair sans space") {
    val out = Bpe.merges(Tables.documents(spark, TestSpark.sf0001), "text", rounds = 3)
      .orderBy("round").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    out.foreach { r =>
      assert(r.getString(2) == r.getString(1).replace(" ", ""))
      assert(r.getLong(3) > 0)
    }
    // distinct best pairs (a merged pair's count drops to 0 afterwards)
    assert(out.map(_.getString(1)).distinct.length == 3)
  }
}
