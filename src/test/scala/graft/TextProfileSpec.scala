package graft

import graft.functions.TextProfile
import graft.text.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `TextProfile` (one-pass counts) bit-equivalent to the pure-HOF
  * formulation it replaces in q173, on the real corpus AND on adversarial
  * strings (empty tokens, multi-space runs, all-duplicate docs). */
class TextProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofProfile = {
    val t = split(col("text"), " ")
    val g = Text.ngramStrings(col("text"), 3)
    struct(
      Text.tokenCount(col("text")).as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      size(g).cast("long").as("n_grams"),
      size(array_distinct(g)).cast("long").as("n_distinct_grams"))
  }

  test("equals the HOF formulation on the documents corpus") {
    val df = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), TextProfile(col("text"), 3).as("fast"), hofProfile.as("slow"))
    val diff = df.filter(col("fast") =!= col("slow"))
    assert(diff.isEmpty, s"mismatch rows: ${diff.take(3).mkString("; ")}")
    // and the corpus exercises the interesting region
    val n = df.count()
    assert(n > 0)
  }

  test("edge cases: empty string, single token, multi-space, short docs, all-dup") {
    val cases = Seq(
      "",                    // one empty token, no grams
      "word",                // 1 token, no grams
      "a b",                 // 2 tokens, still no 3-grams
      "a b c",               // exactly one gram
      "a  b",                // empty middle token (double space)
      " leading",            // empty first token
      "trailing ",           // empty last token
      "x x x x x x",         // all-duplicate tokens and grams
      "a b c a b c a b c")   // repeated grams
    val df = cases.toDF("text")
      .select(col("text"), TextProfile(col("text"), 3).as("fast"), hofProfile.as("slow"))
    val bad = df.filter(col("fast") =!= col("slow")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // spot-check absolute values for the all-dup doc
    val r = df.filter(col("text") === "x x x x x x").select("fast.*").head()
    assert(r.getLong(0) == 6 && r.getLong(1) == 1 && r.getLong(2) == 4 && r.getLong(3) == 1)
  }

  test("null text profiles to null") {
    val df = Seq[Option[String]](None).toDF("text")
      .select(TextProfile(col("text"), 3).as("p"))
    assert(df.head().isNullAt(0))
  }

  test("n_tokens always equals the length-difference formula") {
    val df = Tables.documents(spark, TestSpark.sf0001)
      .select(TextProfile(col("text"), 3).getField("n_tokens").as("a"),
        Text.tokenCount(col("text")).as("b"))
    assert(df.filter(col("a") =!= col("b")).isEmpty)
  }

  test("q318 Flesch on a planted sentence matches the hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fl").toString
    // "Hello world. This is fun!": 5 words, 2 sentences, vowel-group
    // syllables 2+1+1+1+1 = 6 -> 206.835 - 1.015*2.5 - 84.6*1.2 = 102.7775
    Seq((1L, "Hello world. This is fun!"), (2L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q318_flesch_readability")(spark, dir)
      .as[(Long, Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(r(0) == ((1L, 5L, 2L, 6L, Some(102.7775))))
    // empty text: zero words floors sentences at 1 and nulls the score
    assert(r(1) == ((2L, 0L, 1L, 0L, None)))
  }
}
