package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{OneHotEncoder, OneHotEncoderModel, StringIndexer, StringIndexerModel, VectorAssembler}
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
  /** Fail-loud cardinality guard for the one-hot paths: every categorical
    * column's distinct levels end up ON THE DRIVER (StringIndexer's
    * internal fit collect, [[logisticConfusion]]'s explicit one) and as
    * one indicator column each — inherent to one-hot, and unbounded in
    * principle. Rather than let a high-cardinality column silently
    * collect gigabytes, count distincts DISTRIBUTED first (one agg, a
    * scalar per column back) and refuse loudly past
    * `spark.graft.ml.maxCategories` (default 10k ≈ a few MB of labels
    * and a design matrix ML can still fit). APPROX count: N exact
    * countDistincts in one agg plan through Expand (input rows × N
    * through the shuffle — the guard alone would out-cost the fit on a
    * corpus-scale input), while HLL sketches all columns in one cheap
    * map-side pass; a ±2% estimate is irrelevant against an
    * order-of-magnitude driver-safety threshold. */
  private def requireBoundedCategories(df: DataFrame, cols: Seq[String]): Unit =
    if (cols.nonEmpty) {
      val maxCats = df.sparkSession.conf
        .get("spark.graft.ml.maxCategories", "10000").toLong
      val counts = df.agg(approx_count_distinct(col(cols.head), 0.02),
        cols.tail.map(c => approx_count_distinct(col(c), 0.02)): _*).head()
      // HLL at rsd=0.02 is a ±2%-per-sigma estimate, so fail only when the
      // estimate is clearly past the limit (> maxCats·(1+3σ)): a column a
      // hair over the threshold may pass, but one genuinely under it can
      // never be spuriously rejected — the right bias for an
      // order-of-magnitude driver-safety guard
      val failAt = (maxCats * 1.06).toLong
      cols.zipWithIndex.foreach { case (c, i) =>
        val n = counts.getLong(i)
        require(n <= failAt,
          s"one-hot guard: categorical column '$c' has ~$n distinct levels " +
            s"(±2% HLL estimate, > spark.graft.ml.maxCategories=$maxCats " +
            s"plus 3-sigma tolerance); one-hot encoding " +
            s"would collect them all to the driver and emit $n indicator " +
            s"columns — hash or bucket the column, or raise the conf if " +
            s"the driver can genuinely hold it")
      }
    }

  def linearRegression(df: DataFrame, labelCol: String,
                       numericCols: Seq[String], categoricalCols: Seq[String] = Nil)
  : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireBoundedCategories(df, categoricalCols)
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

  /** M5/M7 exact path — multivariate OLS via centered normal equations:
    * ONE map-side-combined aggregation computes every cross-moment
    * (`covar_pop` pairs + means, k(k+3)/2 + 2 aggregates), then the tiny
    * k×k system is solved on the driver by pivotless Gauss-Jordan (same
    * 1-row materialization as [[correlationMatrix]] — inherent, not a
    * scale concern). At 100 TB this is a single pass over the data,
    * deterministic and cross-engine reproducible — unlike the iterative
    * spark.ml fit, it is expressible in ANSI SQL and DuckDB-oracled (q36).
    *
    * Centered (covariance-matrix) form, not raw X'X: removing the
    * intercept/mean mass drops the condition number by orders of
    * magnitude, so engine-level 1-ulp differences in the moment sums stay
    * ~1e-10 relative after the solve. Pivotless elimination requires a
    * non-collinear design (callers pass drop-last indicator sets); the
    * covariance matrix of a non-degenerate design is positive definite, so
    * leading pivots are nonzero.
    *
    * Slope covariances: Var(β) = σ̂²·C⁻¹/n; intercept by β₀ = ȳ − β·x̄ with
    * Var(β₀) = σ̂²(1/n + x̄'C⁻¹x̄/n); σ̂² = n·(var_pop(y) − β·c_xy)/(n−p);
    * p-values from the Student-t tail ([[graft.stats.SpecialFunctions]]) —
    * the same quantities R's `summary(lm(...))` prints
    * (ref `R_groupe4.R:843-847`).
    *
    * @param indicators categorical terms as explicit (column, level)
    *        indicator pairs — levels must be statically known so the SQL
    *        oracle can mirror the design matrix exactly.
    */
  def olsExact(df: DataFrame, labelCol: String, numericCols: Seq[String],
               indicators: Seq[(String, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val featNames = numericCols ++ indicators.map { case (c, l) => s"${c}_oh_$l" }
    val featExprs = numericCols.map(c => col(c).cast("double")) ++
      indicators.map { case (c, l) => (col(c) === l).cast("double") }
    val k = featNames.size
    val base = df.na.drop((numericCols ++ indicators.map(_._1) :+ labelCol).distinct)
      .select(featExprs.zipWithIndex.map { case (e, i) => e.as(s"f$i") }
        :+ col(labelCol).cast("double").as("y"): _*)
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
      (0 until k).map(i => avg(col(s"f$i")).as(s"m$i")) ++
      Seq(avg(col("y")).as("my"), var_pop(col("y")).as("vy")) ++
      (for { i <- 0 until k; j <- i until k }
        yield covar_pop(col(s"f$i"), col(s"f$j")).as(s"c_${i}_$j")) ++
      (0 until k).map(i => covar_pop(col(s"f$i"), col("y")).as(s"cy$i"))
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Double]("n")
    val means = Array.tabulate(k)(i => row.getAs[Double](s"m$i"))
    val my = row.getAs[Double]("my")
    val vy = row.getAs[Double]("vy")
    val cy = Array.tabulate(k)(i => row.getAs[Double](s"cy$i"))

    // Augmented [C | c_xy | I], eliminated with the EXACT op order the
    // generated oracle SQL uses (olsOracleSql) so both engines round alike.
    val w = 2 * k + 1
    val a = Array.tabulate(k)(r => Array.tabulate(w) { c =>
      if (c < k) row.getAs[Double](s"c_${math.min(r, c)}_${math.max(r, c)}")
      else if (c == k) cy(r)
      else if (c == k + 1 + r) 1.0 else 0.0
    })
    for (p <- 0 until k) {
      val piv = a(p)(p)
      for (r <- 0 until k if r != p) {
        val f = a(r)(p)
        for (c <- 0 until w) a(r)(c) = a(r)(c) - f * a(p)(c) / piv
      }
      for (c <- 0 until w) a(p)(c) = a(p)(c) / piv
    }
    val beta = Array.tabulate(k)(r => a(r)(k))
    def inv(i: Int, j: Int): Double = a(i)(k + 1 + j)

    val p = k + 1.0
    val betaDotCy = (0 until k).map(i => beta(i) * cy(i)).sum
    val s2 = n * (vy - betaDotCy) / (n - p)
    val quad = (0 until k).map(i =>
      means(i) * (0 until k).map(j => inv(i, j) * means(j)).sum).sum
    val b0 = my - (0 until k).map(i => beta(i) * means(i)).sum
    val se0 = math.sqrt(s2 * (1.0 / n + quad / n))
    val dofR = n - p
    def pv(t: Double) = graft.stats.SpecialFunctions.tPValueTwoSided(t, dofR)
    // M7 metric rows ride along with null inference columns: RSE = √s2
    // (already the R n−p−1-denominator form via s2), R² = explained/total
    // variance = β·c_xy / var_pop(y) — both closed-form over the same
    // moments, so the generated oracle reproduces them bit-alike.
    val rows: Seq[(String, Double, Option[Double], Option[Double], Option[Double])] =
      (("__intercept", b0, Some(se0), Some(b0 / se0), Some(pv(b0 / se0))) +:
      featNames.indices.map { i =>
        val se = math.sqrt(s2 * inv(i, i) / n)
        (featNames(i), beta(i), Some(se), Some(beta(i) / se), Some(pv(beta(i) / se)))
      }) :+
      ("__rse", math.sqrt(s2), None, None, None) :+
      ("__r2", betaDotCy / vy, None, None, None)
    rows.toDF("term", "estimate", "std_err", "t_value", "p_value")
  }

  /** DuckDB oracle for [[olsExact]]: identical moments (covar_pop/avg) and
    * the identical pivotless Gauss-Jordan, unrolled as one REPLACE-chained
    * CTE per elimination step — generated, so the algorithm can't drift
    * from the Scala solve.
    *
    * @param baseSql SELECT producing columns f0..f{k-1}, y (mirrors the
    *                Spark-side projection exactly)
    * @param terms   output term names, intercept excluded (feature order)
    */
  /** Ridge regression coefficient path — [[olsExact]]'s normal equations
    * with λ added to the covariance diagonal (the intercept stays
    * unpenalized, the textbook centered-ridge form), solved once per λ
    * over ONE distributed moment pass. The k×k elimination is driver-side
    * like olsExact — bounded by the model width, never the corpus — and
    * replays [[ridgeOracleSql]] op for op so the per-λ betas round alike
    * on both engines. Output: (lambda, term, est) with '__intercept'. */
  def ridgePath(df: DataFrame, labelCol: String, numericCols: Seq[String],
                lambdas: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = numericCols.size
    val base = df.na.drop((numericCols :+ labelCol).distinct)
      .select(numericCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"f$i") }
        :+ col(labelCol).cast("double").as("y"): _*)
    val aggs =
      (0 until k).map(i => avg(col(s"f$i")).as(s"m$i")) ++
      Seq(avg(col("y")).as("my")) ++
      (for { i <- 0 until k; j <- i until k }
        yield covar_pop(col(s"f$i"), col(s"f$j")).as(s"c_${i}_$j")) ++
      (0 until k).map(i => covar_pop(col(s"f$i"), col("y")).as(s"cy$i"))
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val means = Array.tabulate(k)(i => row.getAs[Double](s"m$i"))
    val my = row.getAs[Double]("my")
    val cy = Array.tabulate(k)(i => row.getAs[Double](s"cy$i"))
    def cov(i: Int, j: Int): Double =
      row.getAs[Double](s"c_${math.min(i, j)}_${math.max(i, j)}")
    val out = lambdas.flatMap { lam =>
      val a = Array.tabulate(k)(r => Array.tabulate(k + 1) { c =>
        if (c < k) cov(r, c) + (if (c == r) lam else 0.0)
        else cy(r)
      })
      for (p <- 0 until k) {
        val piv = a(p)(p)
        for (r <- 0 until k if r != p) {
          val f = a(r)(p)
          for (c <- 0 to k) a(r)(c) = a(r)(c) - f * a(p)(c) / piv
        }
        for (c <- 0 to k) a(p)(c) = a(p)(c) / piv
      }
      val beta = Array.tabulate(k)(r => a(r)(k))
      val intercept = my - (0 until k).map(i => beta(i) * means(i)).sum
      (numericCols.zip(beta.toSeq) :+ ("__intercept" -> intercept)).map {
        case (t, e) => (lam, t, e)
      }
    }
    out.toDF("lambda", "term", "est")
  }

  /** SQL twin of [[ridgePath]] — one shared moment CTE, a per-λ
    * Gauss-Jordan chain with the λ literal on the diagonal, and beta /
    * intercept rows UNION ALL'd. Same elimination op order as
    * [[olsOracleSql]]. */
  def ridgeOracleSql(baseSql: String, terms: Seq[String],
                     lambdas: Seq[Double], dp: Int): String = {
    val k = terms.size
    def cname(i: Int, j: Int) = s"c_${math.min(i, j)}_${math.max(i, j)}"
    val momentCols =
      (0 until k).map(i => s"avg(f$i) AS m$i") ++
      Seq("avg(y) AS my") ++
      (for { i <- 0 until k; j <- i until k } yield s"covar_pop(f$i, f$j) AS ${cname(i, j)}") ++
      (0 until k).map(i => s"covar_pop(f$i, y) AS cy$i")
    val chains = lambdas.zipWithIndex.map { case (lam, li) =>
      val initCols = (for { r <- 0 until k; c <- 0 to k } yield {
        val v =
          if (c < k && c == r) s"${cname(r, c)} + CAST($lam AS DOUBLE)"
          else if (c < k) cname(r, c)
          else s"cy$r"
        s"$v AS a_${r}_$c"
      }).mkString(", ")
      val stages = (0 until k).map { p =>
        val repl = (for { r <- 0 until k; c <- 0 to k } yield {
          if (r == p) s"a_${p}_$c / a_${p}_$p AS a_${r}_$c"
          else s"a_${r}_$c - a_${r}_$p * a_${p}_$c / a_${p}_$p AS a_${r}_$c"
        }).mkString(", ")
        s"g${p + 1}_$li AS (SELECT * REPLACE ($repl) FROM g${p}_$li)"
      }
      val chain = s"g0_$li AS (SELECT *, $initCols FROM m),\n${stages.mkString(",\n")}"
      val betaDotM = (0 until k).map(i => s"a_${i}_$k * m$i").mkString(" + ")
      val rows = terms.zipWithIndex.map { case (t, i) =>
        s"SELECT CAST($lam AS DOUBLE) AS lambda, '$t' AS term, a_${i}_$k AS est FROM gk_alias_$li"
          .replace(s"gk_alias_$li", s"g${k}_$li")
      } :+ s"SELECT CAST($lam AS DOUBLE) AS lambda, '__intercept' AS term, my - ($betaDotM) AS est FROM g${k}_$li"
      (chain, rows)
    }
    s"""WITH base AS ($baseSql),
       |m AS (SELECT ${momentCols.mkString(", ")} FROM base),
       |${chains.map(_._1).mkString(",\n")}
       |SELECT lambda, term, round(est, $dp) AS est
       |FROM (${chains.flatMap(_._2).mkString("\nUNION ALL\n")}) t""".stripMargin
  }

  def olsOracleSql(baseSql: String, terms: Seq[String], dp: Int): String = {
    val k = terms.size
    val w = 2 * k + 1
    def cname(i: Int, j: Int) = s"c_${math.min(i, j)}_${math.max(i, j)}"
    val momentCols =
      Seq("CAST(count(*) AS DOUBLE) AS n") ++
      (0 until k).map(i => s"avg(f$i) AS m$i") ++
      Seq("avg(y) AS my", "var_pop(y) AS vy") ++
      (for { i <- 0 until k; j <- i until k } yield s"covar_pop(f$i, f$j) AS ${cname(i, j)}") ++
      (0 until k).map(i => s"covar_pop(f$i, y) AS cy$i")
    val initCols = (for { r <- 0 until k; c <- 0 until w } yield {
      val v =
        if (c < k) cname(r, c)
        else if (c == k) s"cy$r"
        else if (c == k + 1 + r) "CAST(1 AS DOUBLE)" else "CAST(0 AS DOUBLE)"
      s"$v AS a_${r}_$c"
    }).mkString(", ")
    val stages = (0 until k).map { p =>
      val repl = (for { r <- 0 until k; c <- 0 until w } yield {
        if (r == p) s"a_${p}_$c / a_${p}_$p AS a_${r}_$c"
        else s"a_${r}_$c - a_${r}_$p * a_${p}_$c / a_${p}_$p AS a_${r}_$c"
      }).mkString(", ")
      s"g${p + 1} AS (SELECT * REPLACE ($repl) FROM g$p)"
    }
    val betaDotCy = (0 until k).map(i => s"a_${i}_$k * cy$i").mkString(" + ")
    val betaDotM = (0 until k).map(i => s"a_${i}_$k * m$i").mkString(" + ")
    val quad = (0 until k).map(i =>
      s"m$i * (${(0 until k).map(j => s"a_${i}_${k + 1 + j} * m$j").mkString(" + ")})")
      .mkString(" + ")
    val termRows =
      (s"SELECT '__intercept' AS term, my - ($betaDotM) AS est, sqrt(s2 * (1.0/n + ($quad)/n)) AS se FROM fin" +:
      terms.zipWithIndex.map { case (t, i) =>
        s"SELECT '$t' AS term, a_${i}_$k AS est, sqrt(s2 * a_${i}_${k + 1 + i} / n) AS se FROM fin"
      }) ++ Seq(
        s"SELECT '__rse' AS term, sqrt(s2) AS est, CAST(NULL AS DOUBLE) AS se FROM fin",
        s"SELECT '__r2' AS term, ($betaDotCy) / vy AS est, CAST(NULL AS DOUBLE) AS se FROM fin")
    s"""WITH base AS ($baseSql),
       |m AS (SELECT ${momentCols.mkString(", ")} FROM base),
       |g0 AS (SELECT *, $initCols FROM m),
       |${stages.mkString(",\n")},
       |fin AS (SELECT *, n * (vy - ($betaDotCy)) / (n - ${k + 1}) AS s2 FROM g$k)
       |SELECT term, round(est, $dp) AS estimate, round(se, $dp) AS std_err,
       | round(est / se, $dp) AS t_value
       |FROM (${termRows.mkString("\nUNION ALL\n")}) t""".stripMargin
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

  /** Shared fit→confusion drive for the spark.ml classifiers: selects only
    * the needed columns, PERSISTS that input (a spark.ml Pipeline traverses
    * it once per indexer fit, once per transform chain, and repeatedly
    * inside the optimizer — without a cache each traversal re-runs the
    * upstream scan + feature exprs), fits, computes the confusion counts
    * eagerly (≤ |labels|² rows), and unpersists before returning. The tiny
    * result is re-parallelized so downstream consumers never re-trigger the
    * pipeline. */
  private def fitConfusion(df: DataFrame, labelCol: String,
                           inputCols: Seq[String],
                           stages: Array[org.apache.spark.ml.PipelineStage]): DataFrame = {
    val spark = df.sparkSession
    val selected = df.select(inputCols.distinct.map(col): _*)
    // Right-size partitions for the fit: each L-BFGS/tree iteration is one
    // treeAggregate job, so at small row counts 32 near-empty partitions
    // cost more in task scheduling than in compute (measured: 3.0 s → 2.1 s
    // for q37's 12-iteration fit at sf0.1 when 32 → 8). Target ~150k rows
    // per partition, capped at the session's parallelism — a no-op at real
    // scale, where n/150k exceeds it. The sizing count is column-pruned to
    // parquet footer metadata, negligible next to the fit's many passes.
    val n = selected.count()
    val parts = math.max(1L,
      math.min(spark.sparkContext.defaultParallelism.toLong, n / 150000L + 1)).toInt
    val input = selected.coalesce(parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new Pipeline().setStages(stages).fit(input)
      val confusion = model.transform(input)
        .groupBy(col(labelCol).as("label"), col("prediction").cast("int").as("prediction"))
        .agg(count(lit(1)).as("cnt"))
      val rows = confusion.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), confusion.schema)
    } finally input.unpersist(blocking = false)
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
    fitConfusion(df, labelCol, labelCol +: numericCols, Array(assembler, dt))
  }

  /** M9-M11 — logistic regression + 0.5-threshold confusion matrix.
    * Returns (label, prediction, cnt) rows — the reference's
    * `table(etat_binaire, pred)` (`R_groupe4.R:1009-1011`) plus accuracy. */
  def logisticConfusion(df: DataFrame, labelCol: String,
                        numericCols: Seq[String], categoricalCols: Seq[String] = Nil,
                        maxIter: Int = 100)
  : DataFrame = {
    // On a linearly-separable label the logistic loss has no finite optimum,
    // so L-BFGS never meets tol and always burns the full budget — callers
    // fitting a separable construction should cap maxIter at the point the
    // decision boundary stabilizes (~20 iters) rather than pay 5× for
    // coefficient digits the 0.5-threshold never sees.
    val lr = new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setTol(1e-6).setThreshold(0.5)
    val spark = df.sparkSession
    import spark.implicits._
    val selected = df.select(
      (labelCol +: (numericCols ++ categoricalCols)).distinct.map(col): _*)
    // same partition right-sizing as fitConfusion (see its comment)
    val n = selected.count()
    val parts = math.max(1L,
      math.min(spark.sparkContext.defaultParallelism.toLong, n / 150000L + 1)).toInt
    val input = selected.coalesce(parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val confusion = try {
      // One-hot encoding as pure column expressions instead of the
      // StringIndexer→OneHotEncoder→VectorAssembler stage chain: the labels
      // query below is the exact StringIndexer(alphabetAsc)+OHE contract —
      // distinct non-null values sorted ascending each get a slot (with
      // handleInvalid=keep the phantom "unseen" index is what dropLast
      // drops), null/unseen rows are all-zeros. Same feature vectors, but
      // the ~1 s of indexer-fit RDD jobs becomes one codegen'd distinct
      // per categorical column over the cached input, and the assembled
      // vector goes straight to LR via array_to_vector.
      requireBoundedCategories(input, categoricalCols)
      val labelsPerCat: Seq[Array[String]] = categoricalCols.map { c =>
        input.filter(col(c).isNotNull).select(col(c).cast("string"))
          .distinct().as[String].collect().sorted
      }
      val oneHots = categoricalCols.zip(labelsPerCat).flatMap { case (c, labels) =>
        labels.map(lab => when(col(c) === lit(lab), 1.0).otherwise(0.0))
      }
      val featArr = array(
        (numericCols.map(c => col(c).cast("double")) ++ oneHots): _*)
      val lrModel = lr.fit(input.withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(featArr)))
      // M12 columnar score-back: at threshold 0.5 the model's binary
      // decision is exactly `margin > 0` (raw2prediction compares the raw
      // score against log(t/(1-t)) = 0), and the margin is an affine form
      // of the input columns — a pure codegen'd expression over the cached
      // input instead of model.transform's per-row ML vector conversion.
      val coefs = lrModel.coefficients.toArray
      val numericSum = numericCols.zipWithIndex
        .map { case (c, i) => col(c).cast("double") * lit(coefs(i)) }
        .reduceOption(_ + _).getOrElse(lit(0.0))
      var off = numericCols.length
      val catSum = categoricalCols.indices.map { j =>
        val labels = labelsPerCat(j)
        val term = labels.zipWithIndex
          .foldLeft(when(lit(false), 0.0)) { case (acc, (lab, i)) =>
            acc.when(col(categoricalCols(j)) === lit(lab), lit(coefs(off + i)))
          }.otherwise(lit(0.0))
        off += labels.length
        term
      }.reduceOption(_ + _).getOrElse(lit(0.0))
      val margin = numericSum + catSum + lit(lrModel.intercept)
      val rows = input
        .select(col(labelCol).as("label"),
          when(margin > 0.0, 1).otherwise(0).as("prediction"))
        .groupBy("label", "prediction").agg(count(lit(1)).as("cnt"))
      spark.createDataFrame(java.util.Arrays.asList(rows.collect(): _*), rows.schema)
    } finally input.unpersist(blocking = false)
    // M11's "précision": (TP+TN)/N attached alongside the matrix — the
    // same Spark expression as always, evaluated over the (tiny,
    // re-parallelized) confusion so rounding is bit-identical
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    confusion.withColumn("accuracy",
      round(sum(when(col("label") === col("prediction"), col("cnt")).otherwise(0L)).over(wAll)
        .cast("double") / sum(col("cnt")).over(wAll), 6))
  }
}
