package graft

import graft.ml.ProductQuantizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10: product quantization ADC search + HLL sketch rollup. */
class PqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PQ: probe is its own ADC nearest neighbor with rank 1") {
    val r = ProductQuantizer.adcTopK(
      Tables.embeddings(spark, TestSpark.sf0001), "vec_id", "embedding",
      blocks = 4, codebookSize = 16, iters = 2, probeId = 0L, topK = 10)
      .orderBy("rank").collect()
    assert(r.length == 10)
    // the probe's own cell centroids are nearest to the probe's blocks —
    // vec 0 must sit at (or tie into) the top; ADC is non-decreasing in rank
    assert(r.head.getLong(1) == 0L)
    val adcs = r.map(_.getDouble(2)).toSeq
    assert(adcs == adcs.sorted)
    assert(adcs.forall(_ >= 0.0))
  }

  test("PQ: ADC preserves coarse geometry (exact near set scores lower)") {
    // Random synthetic embeddings are near-orthogonal (distance
    // concentration), so top-10 recall is not a meaningful gate for a
    // 16-codeword quantizer; the robust property is that ADC still
    // separates the exact near-neighborhood from the bulk on average.
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val probe = e.filter($"vec_id" === 0L).select("v").head().getSeq[Double](0)
    val pv = array(probe.map(lit): _*)
    val exact = e.select(col("vec_id"),
      aggregate(zip_with(col("v"), pv, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("d2"))
    val adcAll = ProductQuantizer.adcTopK(
      Tables.embeddings(spark, TestSpark.sf0001), "vec_id", "embedding",
      blocks = 4, codebookSize = 16, iters = 2, probeId = 0L, topK = 500)
      .select(col("vec_id"), col("adc"))
    val joined = exact.join(adcAll, "vec_id")
      .withColumn("near", rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("d2")) <= 50)
    val means = joined.groupBy("near").agg(avg("adc").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) < means(false),
      s"mean ADC of exact-near set ${means(true)} !< bulk ${means(false)}")
  }

  test("PQ: codebooks have the requested shape and cover every block") {
    val cbs = ProductQuantizer.trainCodebooks(
      Tables.embeddings(spark, TestSpark.sf0001), "vec_id", "embedding",
      blocks = 4, codebookSize = 16, iters = 2)
    assert(cbs.map(_._1) == Seq(0, 1, 2, 3))
    cbs.foreach { case (_, cws) =>
      assert(cws.nonEmpty && cws.size <= 16)
      assert(cws.forall(_._2.length == 16))
    }
  }

  test("HLL rollup: per-source and unioned estimates inside the 5% gate") {
    val r = Queries.queries("q187_hll_rollup")(spark, TestSpark.sf0001)
    val rows = r.collect()
    assert(rows.length == 21) // 20 sources + ALL
    assert(rows.forall(_.getBoolean(2)), "an HLL estimate missed the 5% bound")
    val all = rows.find(_.getString(0) == "ALL").get
    val perMax = rows.filter(_.getString(0) != "ALL").map(_.getLong(1)).max
    // global distinct ≥ any single source's
    assert(all.getLong(1) >= perMax)
  }
}
