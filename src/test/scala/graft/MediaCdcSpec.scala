package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: windowed media energy (q227), streaming CDC
  * latest-per-key (q228). */
class MediaCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media energy: exact squared-code sums, non-vacuous segmentation") {
    val out = Queries.queries("q227_media_energy")(spark, TestSpark.sf0001)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // Recompute one media's frames driver-side from the raw text.
    val id = out.head._1
    val text = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") === id).select("text").as[String].head()
    out.filter(_._1 == id).foreach { case (_, nf, idx, e2, active) =>
      assert(nf == text.length / 32)
      val frame = text.substring(idx * 32, idx * 32 + 32)
      val expect = frame.map(c => c.toInt.toLong * c.toInt).sum
      assert(e2 == expect, s"frame $idx energy")
      assert(active == (e2 > 320000L))
    }
    val frac = out.count(_._5).toDouble / out.length
    assert(frac > 0.05 && frac < 0.95, s"segmentation non-vacuous: $frac")
  }

  test("streaming latest-per-key equals the batch argmax") {
    val got = Queries.queries("q228_stream_upsert")(spark, TestSpark.sf0001)
      .as[(Long, Long, Long, String, Double)].collect().toSet
    val batch = Tables.events(spark, TestSpark.sf0001)
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_micros(col("ts")).as("last_tsu"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // One row per user ever seen.
    assert(got.size ==
      Tables.events(spark, TestSpark.sf0001).select("user_id").distinct().count())
  }
}
