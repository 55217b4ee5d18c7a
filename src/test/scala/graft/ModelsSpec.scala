package graft

import graft.ml.Models
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
    val coefs = Models.linearRegression(df, "y", Seq("x1", "x2"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(coefs("x1") - 3.0) < 1e-6)
    assert(math.abs(coefs("x2") + 2.0) < 1e-6)
    assert(math.abs(coefs("__intercept") - 7.0) < 1e-6)
    assert(coefs("__r2") > 0.999999)
    assert(coefs("__rse") < 1e-6)
  }

  test("logisticConfusion: separable data → perfect confusion matrix") {
    val df = (1 to 100).map { i =>
      val x = i.toDouble
      (if (x > 50) 1.0 else 0.0, x)
    }.toDF("label", "x")
    val cm = Models.logisticConfusion(df, "label", Seq("x"))
      .as[(Double, Int, Long)].collect()
      .map { case (l, p, n) => (l, p) -> n }.toMap
    assert(cm.getOrElse((0.0, 0), 0L) == 50L)
    assert(cm.getOrElse((1.0, 1), 0L) == 50L)
    assert(!cm.contains((0.0, 1)) && !cm.contains((1.0, 0)))
  }

  test("linearRegression with categorical predictor fits group offsets") {
    // y = 10 + 5*[g=b] : categorical-only model
    val df = (1 to 40).map { i =>
      val g = if (i % 2 == 0) "b" else "a"
      (if (g == "b") 15.0 else 10.0, 1.0, g)
    }.toDF("y", "one", "g")
    val coefs = Models.linearRegression(df, "y", Seq("one"), Seq("g"))
      .as[(String, Double)].collect().toMap
    assert(coefs("__r2") > 0.999999)
  }
}
