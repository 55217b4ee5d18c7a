package graft.pipeline

import graft.functions.Lambert93
import graft.operators.{Cleaning, Impute}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's E1 backbone — ingest → clean → impute → reproject →
  * export (`R_groupe4.R:41-209,1069-1077`) — composed from the operator
  * library as ONE lazy DataFrame chain: Catalyst collapses the ~20 stages
  * into a few physical projections; shuffles occur only at distinct/
  * dedup, the group fills, the mode join, and the 1-NN impute.
  *
  * Row-order semantics (R's `duplicated`, `first`, `which.min` depend on
  * file order; Spark has no row order — SURVEY.md §7-1) are made explicit
  * with an ingest id: `monotonically_increasing_id` ordered by input file
  * split. For byte-exact parity with a single-file reference input this
  * reproduces file order; multi-file ingest gets a documented total order
  * (file, offset) instead.
  */
object TreePipeline {

  /** Raw CSV schema (FIXTURES.md A; drop-list cols included). */
  val rawSchema: StructType = StructType(Seq(
    StructField("id_arbre", LongType), StructField("OBJECTID", LongType),
    StructField("GlobalID", StringType),
    StructField("X", DoubleType), StructField("Y", DoubleType),
    StructField("haut_tot", DoubleType), StructField("haut_tronc", DoubleType),
    StructField("tronc_diam", DoubleType), StructField("age_estim", DoubleType),
    StructField("fk_prec_estim", DoubleType), StructField("clc_nbr_diag", DoubleType),
    StructField("clc_quartier", StringType), StructField("clc_secteur", StringType),
    StructField("fk_arb_etat", StringType), StructField("fk_stadedev", StringType),
    StructField("fk_port", StringType), StructField("fk_pied", StringType),
    StructField("fk_situation", StringType), StructField("fk_revetement", StringType),
    StructField("fk_nomtech", StringType), StructField("feuillage", StringType),
    StructField("remarquable", StringType), StructField("villeca", StringType),
    StructField("src_geo", StringType),
    StructField("created_user", StringType), StructField("created_date", StringType),
    StructField("Creator", StringType), StructField("CreationDate", StringType),
    StructField("Editor", StringType), StructField("EditDate", StringType),
    StructField("last_edited_user", StringType), StructField("last_edited_date", StringType),
    StructField("nomfrancais", StringType), StructField("nomlatin", StringType),
    StructField("commentaire_environnement", StringType),
    StructField("dte_plantation", StringType), StructField("dte_abattage", StringType)))

  /** The reference's drop list (`R_groupe4.R:83-87`). */
  val dropList: Seq[String] = Seq(
    "id_arbre", "created_user", "created_date", "Editor", "EditDate", "nomlatin",
    "CreationDate", "Creator", "last_edited_date", "last_edited_user", "GlobalID",
    "OBJECTID", "dte_plantation", "dte_abattage", "nomfrancais",
    "commentaire_environnement")

  /** Null-drop columns (`R_groupe4.R:55-70`). */
  val requiredCols: Seq[String] = Seq(
    "X", "Y", "fk_port", "remarquable", "feuillage", "fk_nomtech", "fk_prec_estim",
    "src_geo", "fk_revetement", "haut_tot", "haut_tronc", "tronc_diam", "age_estim")

  /** Final 20-column export schema (Rapport p.13; `R_groupe4.R:1071-1072`). */
  val exportCols: Seq[String] = Seq(
    "clc_quartier", "clc_secteur", "haut_tot", "haut_tronc", "tronc_diam",
    "fk_arb_etat", "fk_stadedev", "fk_port", "fk_pied", "fk_situation",
    "fk_revetement", "age_estim", "fk_prec_estim", "clc_nbr_diag", "fk_nomtech",
    "feuillage", "remarquable", "longitude", "latitude", "villeca")

  /** Apply the Lambert-93→WGS84 reprojection + the reference's manual map
    * calibration offsets (`R_groupe4.R:93-106`, X1 + F10). Computed in
    * place as column expressions — no positional bind (the reference's
    * `cbind` J6 anti-pattern has no Spark equivalent and needs none). */
  def reproject(df: DataFrame): DataFrame = df
    .withColumn("longitude",
      Lambert93.lonDeg(col("X"), col("Y")) + lit(Lambert93.CALIB_LON_OFFSET))
    .withColumn("latitude",
      Lambert93.latDeg(col("X"), col("Y")) + lit(Lambert93.CALIB_LAT_OFFSET))

  /** Strategy for [[knnFill]]: the exact crossJoin form suits the
    * reference regime (missing side small enough to broadcast); the grid
    * form is the 100 TB path. The choice is the CALLER's — a data-driven
    * switch would need a count mid-pipeline, i.e. a hidden Spark job that
    * re-runs the whole upstream clean chain before the real one. Callers
    * know their regime (or can count once outside the lazy chain). */
  sealed trait KnnStrategy
  case object KnnExact extends KnnStrategy
  case object KnnGrid extends KnnStrategy

  /** 1-NN imputation of a categorical column from (X,Y) neighbors
    * (`R_groupe4.R:113-142`, J4/J5): null rows take the value of the
    * geometrically nearest non-null row. With [[KnnExact]] this is purely
    * lazy — builds the plan, triggers no job (TreePipelineSpec asserts
    * this); [[KnnGrid]] necessarily runs its bounded escalation rounds. */
  def knnFill(df: DataFrame, target: String, strategy: KnnStrategy = KnnExact,
              cellSize: Double = 500.0): DataFrame = {
    val missing = df.filter(col(target).isNull)
    val known = df.filter(col(target).isNotNull)
    val imputed = strategy match {
      case KnnGrid =>
        Impute.knnImputeGrid(missing, known, "X", "Y", "__ingest_id", "__ingest_id",
          Seq(target), cellSize)
      case KnnExact =>
        Impute.knnImputeExact(missing, known, "X", "Y", "__ingest_id", "__ingest_id",
          Seq(target))
    }
    df.join(imputed.withColumnRenamed(s"${target}_nn", s"__fill_$target"),
        Seq("__ingest_id"), "left")
      .withColumn(target, coalesce(col(target), col(s"__fill_$target")))
      .drop(s"__fill_$target")
  }

  /** The full E1 cleaning pipeline on a raw-schema DataFrame. Stage order
    * and every data quirk (Gricourt/Griourt typo filter, 300→200 cap,
    * "Inconnue" sentinel, constant src_geo) mirror the reference.
    *
    * `knn` picks the 1-NN impute strategy for both J4/J5 stages:
    * [[KnnExact]] (default — the reference regime, fully lazy) or
    * [[KnnGrid]] (the 100 TB path; identical results, see
    * TreePipelineSpec's grid==exact pipeline case). */
  def clean(raw: DataFrame, knn: KnnStrategy = KnnExact,
            knnCellSize: Double = 500.0): DataFrame = {
    var df = raw.withColumn("__ingest_id", monotonically_increasing_id())
    df = Cleaning.normalizeBlanks(df)                                    // P1  :45
    df = Cleaning.distinctRows(df)                                       // P2  :49
    df = Cleaning.dedupKeepFirst(df, Seq("X", "Y", "fk_arb_etat"),
      Seq(col("__ingest_id")))                                           // P3  :52
    df = Cleaning.requireNonNull(df, requiredCols)                       // P4  :55-70
    df = Cleaning.sanityFilter(df, col("haut_tot") >= col("haut_tronc")) // P5  :72-74 (off)
    df = Cleaning.constantFill(df, "src_geo", "Orthophoto")              // P6  :77
    df = Cleaning.winsorize(df, "age_estim", 300, 200)                   // P7  :80
    df = Cleaning.dropCols(df, dropList)                                 // P8  :83-87
    df = Cleaning.relabel(df, "fk_stadedev", "Adulte", "adulte")         // F2  :90
    df = Cleaning.relabel(df, "fk_stadedev", "Jeune", "jeune")           // F2  :91
    df = reproject(df)                                                   // X1  :93-106
    df = knnFill(df, "clc_quartier", knn, knnCellSize)                   // J4  :113-124
    df = knnFill(df, "clc_secteur", knn, knnCellSize)                    // J5  :126-142
    df = df.filter(!col("clc_secteur").isin("Gricourt", "Griourt") ||
      col("clc_secteur").isNull)                                         // P10 :145-146
    df = Cleaning.titleCase(df, "clc_secteur")                           // F3  :178
    df = Impute.firstFills(df, Seq("clc_secteur"),
      Seq("fk_pied" -> false, "fk_situation" -> true),
      "__ingest_id")                                    // A9+A10 fused :181-190
    df = Impute.modeFill(df, Seq("clc_quartier"), "villeca")             // A7+J1 :194-205
    val stringCols = df.schema.fields
      .filter(f => f.dataType == StringType && exportCols.contains(f.name)).map(_.name)
    df = Cleaning.fillUnknown(df, "Inconnue", stringCols.toSeq)          // F8  :209
    df.select(exportCols.map(col): _*)                                   // P14 :1071-1072
  }

  /** Typed row of the cleaned export — compile-time field safety for
    * downstream analytics (`Dataset[TreeClean]`); column names/types match
    * [[exportCols]] exactly. */
  case class TreeClean(
      clc_quartier: String, clc_secteur: String,
      haut_tot: Double, haut_tronc: Double, tronc_diam: Double,
      fk_arb_etat: String, fk_stadedev: String, fk_port: String, fk_pied: String,
      fk_situation: String, fk_revetement: String,
      age_estim: Double, fk_prec_estim: Double, clc_nbr_diag: Option[Double],
      fk_nomtech: String, feuillage: String, remarquable: String,
      longitude: Double, latitude: Double, villeca: String)

  /** [[clean]] with a typed result. */
  def cleanTyped(raw: DataFrame, knn: KnnStrategy = KnnExact)
      : org.apache.spark.sql.Dataset[TreeClean] = {
    val spark = raw.sparkSession
    import spark.implicits._
    clean(raw, knn).as[TreeClean]
  }

  /** End-to-end: CSV in → clean → CSV out (S1→E1→S2). */
  def run(spark: SparkSession, inPath: String, outPath: String,
          knn: KnnStrategy = KnnExact): DataFrame = {
    val raw = graft.io.Csv.read(spark, inPath, rawSchema)
    val cleaned = clean(raw, knn)
    graft.io.Csv.write(cleaned, outPath)
    cleaned
  }
}
