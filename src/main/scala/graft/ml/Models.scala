package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark.ml model operators (SURVEY.md §2.9 M5-M12).
  *
  * The reference fits `lm`/`glm` in-memory (`R_groupe4.R:843-847,981-1011`);
  * here both are distributed Pipelines. Linear regression uses the "normal"
  * (closed-form WLS) solver — deterministic and exact, one treeAggregate
  * pass over the executors; logistic uses L-BFGS with fixed iteration/tol
  * so refits are reproducible.
  */
object Models {

  /** M5/M6 — linear regression with optional categorical predictors
    * (StringIndexer → OneHotEncoder → VectorAssembler → LinearRegression).
    * Returns one row per coefficient: (term, estimate) + intercept +
    * rse/r2 metrics rows (M7; RSE uses R's n−p−1 denominator). */
  def linearRegression(df: DataFrame, labelCol: String,
                       numericCols: Seq[String], categoricalCols: Seq[String] = Nil)
  : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val indexers = categoricalCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep"))
    val encoders = categoricalCols.map(c =>
      new OneHotEncoder().setInputCol(s"${c}_idx").setOutputCol(s"${c}_oh"))
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(c => s"${c}_oh")).toArray)
      .setOutputCol("features")
    val lr = new LinearRegression().setLabelCol(labelCol).setFeaturesCol("features")
      .setSolver("normal")
    val model = new Pipeline().setStages((indexers ++ encoders :+ assembler :+ lr).toArray)
      .fit(df)
    val lrm = model.stages.last.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val s = lrm.summary
    val n = s.numInstances.toDouble
    val p = lrm.coefficients.size.toDouble
    // R reports sigma with the n-p-1 denominator (SURVEY.md §7-4):
    val rse = math.sqrt(s.meanSquaredError * n / (n - p - 1))
    val coefRows = numericCols.zipWithIndex.map { case (c, i) => (c, lrm.coefficients(i)) }
    (coefRows ++ Seq(
      ("__intercept", lrm.intercept),
      ("__rse", rse),
      ("__r2", s.r2))).toDF("term", "estimate")
  }

  /** M9-M11 — logistic regression + 0.5-threshold confusion matrix.
    * Returns (label, prediction, cnt) rows — the reference's
    * `table(etat_binaire, pred)` (`R_groupe4.R:1009-1011`) plus accuracy. */
  def logisticConfusion(df: DataFrame, labelCol: String,
                        numericCols: Seq[String], categoricalCols: Seq[String] = Nil)
  : DataFrame = {
    val indexers = categoricalCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep"))
    val encoders = categoricalCols.map(c =>
      new OneHotEncoder().setInputCol(s"${c}_idx").setOutputCol(s"${c}_oh"))
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(c => s"${c}_oh")).toArray)
      .setOutputCol("features")
    val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(100).setTol(1e-6).setThreshold(0.5)
    val model = new Pipeline().setStages((indexers ++ encoders :+ assembler :+ lr).toArray)
      .fit(df)
    model.transform(df)
      .groupBy(col(labelCol).as("label"), col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
  }
}
