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

  test("banded attribution equals the direct time-range join") {
    val got = Queries.queries("q231_attribution")(spark, TestSpark.sf0001)
      .select("pid", "n_clicks", "first_click_id", "last_click_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("tsu").as("ptsu"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("tsu").as("ctsu"))
    val j = p.join(c, Seq("user_id"))
      .filter(col("ctsu") <= col("ptsu") &&
        col("ctsu") >= col("ptsu") - 3600000000L)
    val agg = j.groupBy("pid").agg(count(lit(1)).as("n_clicks"),
      min(struct(col("ctsu"), col("cid"))).getField("cid").as("first_click_id"),
      max(struct(col("ctsu"), col("cid"))).getField("cid").as("last_click_id"))
    val naive = p.select("pid").join(agg, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        col("first_click_id"), col("last_click_id"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == naive)
    assert(got.exists(_._2 > 0), "some purchase has a prior click")
    // Whenever more than one click is attributed, first and last differ.
    got.filter(_._2 > 1).foreach { r =>
      assert(r._3.isDefined && r._4.isDefined && r._3 != r._4, r.toString)
    }
  }

  test("dedup threshold sweep is monotone in the threshold") {
    val rows = Queries.queries("q232_dedup_threshold_sweep")(spark, TestSpark.sf0001)
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.3, 0.5, 0.7))
    // Raising the threshold removes edges: clusters split (count grows),
    // duplicated-doc mass shrinks.
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "n_clusters non-decreasing")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq,
      "dup docs non-increasing")
  }

  test("session_window stream equals the >=-gap batch replay; events conserved") {
    val got = Queries.queries("q238_session_window")(spark, TestSpark.sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._3).sum == Tables.events(spark, TestSpark.sf0001).count())
    // Batch replay with the same >= boundary rule.
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val batch = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("tsu") - col("prev") >= 1800000000L, 1L).otherwise(0L))
      .withColumn("seq", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg((min(col("tsu")) / 1000000L).cast("long").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .select("user_id", "session_start", "n_events", "session_value")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSet == batch.toSet)
  }

  test("merkle audit root detects a single-row tamper") {
    val out = Queries.queries("q239_merkle_audit")(spark, TestSpark.sf0001)
      .as[(String, String)].collect().toMap
    assert(out.size == out.keySet.size && out.contains("__root"))
    // Tampered replay: flip one order's priority and recompute.
    val tampered = Tables.orders(spark, TestSpark.sf0001)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") === 1L, lit("TAMPERED"))
          .otherwise(col("o_orderpriority")))
    val h = tampered.select(md5(concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"))).as("h"))
    val b = h.withColumn("bucket", substring(col("h"), 1, 2))
      .groupBy("bucket")
      .agg(md5(array_join(array_sort(collect_list(col("h"))), "")).as("digest"))
    val root2 = b.agg(md5(array_join(array_sort(collect_list(col("digest"))), "")))
      .as[String].head()
    assert(root2 != out("__root"))
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
