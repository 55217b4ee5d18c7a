package graft

import graft.ml.Models
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ModelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("linearRegression recovers exact coefficients on noiseless data") {
    // y = 3x1 - 2x2 + 7
    val df = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = (i % 7).toDouble
      (3 * x1 - 2 * x2 + 7, x1, x2)
    }.toDF("y", "x1", "x2")
    val out = Models.linearRegression(df, "y", Seq("x1", "x2"))
    val coefs = out.select("term", "estimate").as[(String, Double)].collect().toMap
    assert(math.abs(coefs("x1") - 3.0) < 1e-6)
    assert(math.abs(coefs("x2") + 2.0) < 1e-6)
    assert(math.abs(coefs("__intercept") - 7.0) < 1e-6)
    assert(coefs("__r2") > 0.999999)
    assert(coefs("__rse") < 1e-6)
    // inference summary present for every coefficient term
    val se = out.filter(!col("term").startsWith("__")).select("std_err")
      .as[Double].collect()
    assert(se.length == 2)
  }

  test("logisticConfusion: separable data → perfect confusion matrix") {
    val df = (1 to 100).map { i =>
      val x = i.toDouble
      (if (x > 50) 1.0 else 0.0, x)
    }.toDF("label", "x")
    val out = Models.logisticConfusion(df, "label", Seq("x"))
    val cm = out.select("label", "prediction", "cnt")
      .as[(Double, Int, Long)].collect()
      .map { case (l, p, n) => (l, p) -> n }.toMap
    assert(cm.getOrElse((0.0, 0), 0L) == 50L)
    assert(cm.getOrElse((1.0, 1), 0L) == 50L)
    assert(!cm.contains((0.0, 1)) && !cm.contains((1.0, 0)))
    assert(out.select("accuracy").as[Double].collect().forall(_ == 1.0))
  }

  test("logisticConfusion columnar score-back == model.transform, non-separable data") {
    // overlapping classes → points on both sides of the boundary, so this
    // genuinely exercises the margin>0 decision rule the columnar
    // score-back replaces model.transform with (threshold 0.5 ⟺ raw
    // threshold 0); includes a categorical column to cover the one-hot
    // coefficient resolution (labels, dropLast, unseen→0)
    val rng = new scala.util.Random(17)
    val df = (1 to 400).map { i =>
      val x = rng.nextGaussian() * 2.0
      val g = Seq("u", "v", "w")(i % 3)
      val label = if (x + (if (g == "v") 1.0 else 0.0) + rng.nextGaussian() > 0) 1.0 else 0.0
      (label, x, rng.nextGaussian(), g)
    }.toDF("label", "x1", "x2", "g")
    val got = Models.logisticConfusion(df, "label", Seq("x1", "x2"), Seq("g"), maxIter = 20)
      .select("label", "prediction", "cnt").as[(Double, Int, Long)].collect().toSet
    // independent ground truth: the same pipeline scored via model.transform
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
    import org.apache.spark.ml.classification.LogisticRegression
    val stages = Array[org.apache.spark.ml.PipelineStage](
      new StringIndexer().setInputCol("g").setOutputCol("g_idx")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep"),
      new OneHotEncoder().setInputCol("g_idx").setOutputCol("g_oh"),
      new VectorAssembler().setInputCols(Array("x1", "x2", "g_oh"))
        .setOutputCol("features"),
      new LogisticRegression().setLabelCol("label").setFeaturesCol("features")
        .setMaxIter(20).setTol(1e-6).setThreshold(0.5))
    val want = new Pipeline().setStages(stages).fit(df).transform(df)
      .groupBy(col("label"), col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Double, Int, Long)].collect().toSet
    assert(got == want)
    assert(got.exists(_._2 == 0) && got.exists(_._2 == 1), "both classes predicted")
  }

  test("linearRegression with categorical predictor fits group offsets") {
    // y = 10 + 5*[g=b] : categorical-only model
    val df = (1 to 40).map { i =>
      val g = if (i % 2 == 0) "b" else "a"
      (if (g == "b") 15.0 else 10.0, 1.0, g)
    }.toDF("y", "one", "g")
    val coefs = Models.linearRegression(df, "y", Seq("one"), Seq("g"))
      .select("term", "estimate").as[(String, Double)].collect().toMap
    assert(coefs("__r2") > 0.999999)
  }

  test("correlationMatrix long form matches pairwise corr") {
    val df = (1 to 30).map(i => (i.toDouble, 2.0 * i, (i % 5).toDouble))
      .toDF("a", "b", "c")
    val m = Models.correlationMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(math.abs(m(("a", "b")) - 1.0) < 1e-12)
    val cAC = df.stat.corr("a", "c")
    assert(math.abs(m(("a", "c")) - cAC) < 1e-9)
    assert(m.size == 3)
  }

  test("one-hot maxCategories guard trips loudly on a high-cardinality categorical") {
    // every row its own level: one-hot would collect n levels to the
    // driver and build n indicator columns — the guard must refuse
    // BEFORE any collect happens, on both one-hot model paths
    val df = (1 to 40).map(i => (i.toDouble, i.toDouble, s"cat_$i"))
      .toDF("y", "x", "c")
    spark.conf.set("spark.graft.ml.maxCategories", "10")
    try {
      val e1 = intercept[IllegalArgumentException] {
        Models.linearRegression(df, "y", Seq("x"), Seq("c"))
      }
      assert(e1.getMessage.contains("maxCategories") && e1.getMessage.contains("'c'"))
      val e2 = intercept[IllegalArgumentException] {
        Models.logisticConfusion(
          df.withColumn("y", (col("x") > 20).cast("double")), "y", Seq("x"), Seq("c"))
      }
      assert(e2.getMessage.contains("maxCategories"))
      // under the bound the same shape fits fine
      val small = (1 to 40).map(i => (i.toDouble, i.toDouble, s"g_${i % 3}"))
        .toDF("y", "x", "c")
      assert(Models.linearRegression(small, "y", Seq("x"), Seq("c")).count() > 0)
    } finally spark.conf.unset("spark.graft.ml.maxCategories")
  }

  test("decisionTreeConfusion separates a thresholded label perfectly") {
    val df = (1 to 100).map { i => (if (i > 50) 1.0 else 0.0, i.toDouble) }
      .toDF("label", "x")
    val cm = Models.decisionTreeConfusion(df, "label", Seq("x"))
      .as[(Double, Int, Long)].collect()
      .map { case (l, p, n) => (l, p) -> n }.toMap
    assert(cm.getOrElse((0.0, 0), 0L) == 50L)
    assert(cm.getOrElse((1.0, 1), 0L) == 50L)
  }
}
