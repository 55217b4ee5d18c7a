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

  /** M5/M6/M7 — linear regression with optional categorical predictors
    * (StringIndexer → OneHotEncoder → VectorAssembler → LinearRegression).
    * Output: one row per term — (term, estimate, std_err, t_value,
    * p_value) with feature names recovered from the assembled-vector ML
    * attribute metadata (so one-hot slots read "col_oh_LEVEL"), plus
    * __intercept / __rse (R's n−p−1 denominator) / __r2 metric rows. */
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
    val names: Array[String] = {
      val field = model.transform(df.limit(1)).schema("features")
      val ag = org.apache.spark.ml.attribute.AttributeGroup.fromStructField(field)
      ag.attributes
        .map(_.map(a => a.name.getOrElse(s"f${a.index.getOrElse(-1)}")))
        .getOrElse(Array.tabulate(lrm.coefficients.size)(i => s"f$i"))
    }
    // summary arrays carry the intercept LAST when fitIntercept is on;
    // they're unavailable when WLS had to fall back to quasi-Newton on a
    // singular (collinear) design — degrade to NaN rather than fail
    val pAll = lrm.coefficients.size + 1
    val se = scala.util.Try(s.coefficientStandardErrors)
      .getOrElse(Array.fill(pAll)(Double.NaN))
    val tv = scala.util.Try(s.tValues).getOrElse(Array.fill(pAll)(Double.NaN))
    val pv = scala.util.Try(s.pValues).getOrElse(Array.fill(pAll)(Double.NaN))
    val coefRows = names.zipWithIndex.map { case (name, i) =>
      (name, lrm.coefficients(i), se(i), tv(i), pv(i))
    }.toSeq
    val nan = Double.NaN
    (coefRows ++ Seq(
      ("__intercept", lrm.intercept, se.last, tv.last, pv.last),
      ("__rse", rse, nan, nan, nan),
      ("__r2", s.r2, nan, nan, nan)))
      .toDF("term", "estimate", "std_err", "t_value", "p_value")
  }

  /** M2 matrix form — Pearson correlation matrix of the given columns via
    * spark.ml.stat.Correlation (one distributed Gramian pass), returned
    * long-form: (var_a, var_b, corr). "complete.obs" semantics: rows with
    * any null among the columns are dropped first (ref `R_groupe4.R:803`). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val assembled = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("__v")
      .transform(df.na.drop(cols))
      .select("__v")
    val m = org.apache.spark.ml.stat.Correlation.corr(assembled, "__v", "pearson")
      .first().getAs[org.apache.spark.ml.linalg.Matrix](0)
    val rows = for {
      i <- cols.indices
      j <- cols.indices
      if i < j
    } yield (cols(i), cols(j), m(i, j))
    rows.toDF("var_a", "var_b", "corr")
  }

  /** M13 — decision tree classifier (imported but never used by the
    * reference; provided for completeness). Returns (label, prediction,
    * cnt) like [[logisticConfusion]]. */
  def decisionTreeConfusion(df: DataFrame, labelCol: String,
                            numericCols: Seq[String], maxDepth: Int = 5): DataFrame = {
    val assembler = new VectorAssembler().setInputCols(numericCols.toArray)
      .setOutputCol("features")
    val dt = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features").setMaxDepth(maxDepth).setSeed(42L)
    val model = new Pipeline().setStages(Array(assembler, dt)).fit(df)
    model.transform(df)
      .groupBy(col(labelCol).as("label"), col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
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
    val confusion = model.transform(df)
      .groupBy(col(labelCol).as("label"), col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
    // M11's "précision": (TP+TN)/N attached alongside the matrix
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    confusion.withColumn("accuracy",
      round(sum(when(col("label") === col("prediction"), col("cnt")).otherwise(0L)).over(wAll)
        .cast("double") / sum(col("cnt")).over(wAll), 6))
  }
}
