package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins minHashLshSweep (one signature pass + one finest-banding
  * self-join, coarser configs derived per pair via AnyBandEqual) to the
  * per-config minHashLsh calls it replaces in q234 — row-identical
  * output per config, on the real sf0.001 corpus and on a synthetic
  * near-dup fixture.
  */
class MinHashLshSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val configs = Seq((16, 1), (8, 2), (4, 4))

  private def sweepVsPerConfig(df: org.apache.spark.sql.DataFrame,
                               threshold: Double): Unit = {
    val sweep = Dedup.minHashLshSweep(df, "text", "doc_id", k = 3,
        configs, threshold = threshold, family = "md5p61")
      .select("bands", "rpb", "id_a", "id_b", "est_jaccard")
    val perConfig = configs.map { case (b, r) =>
      Dedup.minHashLsh(df, "text", "doc_id", k = 3, bands = b,
          rowsPerBand = r, threshold = threshold, family = "md5p61")
        .select(lit(b).as("bands"), lit(r).as("rpb"),
          col("id_a"), col("id_b"), col("est_jaccard"))
    }.reduce(_.unionByName(_))
    assert(sweep.exceptAll(perConfig).isEmpty &&
      perConfig.exceptAll(sweep).isEmpty,
      "sweep output must be row-identical to the per-config minHashLsh union")
  }

  test("sweep matches per-config minHashLsh on the sf0.001 corpus") {
    sweepVsPerConfig(Tables.documents(spark, TestSpark.sf0001), 0.5)
  }

  test("sweep matches per-config minHashLsh on a planted near-dup fixture") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      1L -> base,
      2L -> base.replace("today", "tomorrow"),
      3L -> base,
      4L -> "completely unrelated text with nothing shared at all here now",
      5L -> "another distinct document that overlaps with no other entry")
      .toDF("doc_id", "text")
    // low threshold so coarse and fine bandings disagree on membership
    sweepVsPerConfig(df, 0.2)
    // the planted exact dup must be found by every config
    val sweep = Dedup.minHashLshSweep(df, "text", "doc_id", k = 3,
      configs, threshold = 0.5, family = "md5p61")
    assert(sweep.filter(col("id_a") === 1L && col("id_b") === 3L)
      .count() == configs.size)
  }

  test("configs with mismatched signature width are rejected") {
    val df = Seq(1L -> "a b c").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minHashLshSweep(df, "text", "doc_id", k = 3,
        Seq((16, 1), (8, 1)), threshold = 0.5, family = "md5p61")
    }
  }
}
