package graft

import graft.dedup.Dedup
import graft.functions.Lambert93
import graft.ml.Models
import graft.multimodal.Multimodal
import graft.operators.{Cleaning, Impute, Rankings}
import graft.similarity.Similarity
import graft.stats.Stats
import graft.streaming.EventsStream
import graft.text.{Mixing, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared plumbing for the QueriesPart* files — the table accessors,
  * cross-part shared sub-plans and fixture constants that lived in the
  * monolithic Queries.scala before the r13 family split (pure move).
  */
private[graft] object QueriesBase {
  type Q = (SparkSession, String) => DataFrame

  /** Session shuffle width for PINNED repartitions: repartition by key
    * WITHOUT an explicit count is AQE-coalescible, and on the tiny
    * pre-explode inputs these calls guard (a 0.6-2 MB single-row-group
    * scan) AQE collapses the exchange back to 1-2 partitions — exactly
    * the serial stage the repartition exists to widen (r17; the
    * ngramJaccardSelfPairs pinning rule). */
  private[graft] def nPart(s: SparkSession): Int =
    scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(200)

  private[graft] def li(s: SparkSession, d: String)  = Tables.lineitem(s, d)
  private[graft] def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private[graft] def ev(s: SparkSession, d: String)  = Tables.events(s, d)
  private[graft] def doc(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The support-2 co-purchase part graph shared by q147/q159/q161/q162/
    * q168: undirected pairs (u < v) of parts sharing ≥ 2 orders. The
    * per-order self-join is bounded by basket size; the min-support
    * filter keeps the graph sparse (same device as every frequent-itemset
    * pipeline). */
  private[graft] def copurchasePairs(s: SparkSession, d: String): DataFrame = {
    val lp = li(s, d).select(col("l_orderkey"), col("l_partkey"))
    lp.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(lp.select(col("l_orderkey"), col("l_partkey").as("v")),
        Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= 2)
      .select("u", "v")
  }

  /** q220/q276 shared 16-token chunk cut — (doc_id, idx, chunk) rows,
    * chunks cut per-row with transform+slice (no explode-join); the
    * keeper rule over these is min(struct(doc_id, idx)). One definition
    * so the chunk-grid arithmetic can never diverge between its users. */
  private[graft] def chunks16(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("__t"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, (size(__t) - 1) DIV 16),
          |  i -> array_join(slice(__t, i * 16 + 1, 16), ' '))""".stripMargin))
        .as(Seq("idx", "chunk")))

  /** q257/q275 shared alpha-ratio quality score over `text` (0.0 for an
    * empty string — the divide guard), exact-int/exact-int so the double
    * is engine-identical. */
  private[graft] def alphaRatio: Column =
    when(length(col("text")) > 0,
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
        length(col("text"))).otherwise(lit(0.0))

  // ---------------------------------------------------------------- queries

  /** Tiny literal DataFrame helper for sweep-config tables. */
  private[graft] def litConfigs(s: SparkSession)(rows: Seq[(Int, Int)],
                                          c1: String, c2: String): DataFrame = {
    import s.implicits._
    rows.toDF(c1, c2)
  }

  /** events with exact epoch-micro timestamps — shared by q231. */
  private[graft] def ev_(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("tsu"))

  /** Committed CSV fixture for q68 (30 rows, UTF-8 accents, hyphenated
    * names, blank cells). Resolved relative to the repo root whether the
    * JVM starts there or elsewhere. */
  private[graft] def csvFixturePath: String =
    Seq("data/trees_fixture.csv", "/root/repo/data/trees_fixture.csv")
      .map(new java.io.File(_)).find(_.exists).map(_.getAbsolutePath)
      .getOrElse("data/trees_fixture.csv")

  /** The columns q68/q72 project (haut_tronc is parsed but dropped,
    * mirroring the reference's export pruning). */
  private[graft] val csvFixtureCols: Seq[String] = Seq(
    "X", "Y", "haut_tot", "tronc_diam", "age_estim", "clc_quartier",
    "clc_secteur", "fk_arb_etat", "fk_stadedev", "feuillage", "remarquable")

  private[graft] def csvFixtureOracleSql: String =
    s"""SELECT ${csvFixtureCols.mkString(", ")}
       |FROM read_csv('$csvFixturePath', header=true,
       | columns={'X':'DOUBLE','Y':'DOUBLE','haut_tot':'DOUBLE',
       |  'haut_tronc':'DOUBLE','tronc_diam':'DOUBLE','age_estim':'DOUBLE',
       |  'clc_quartier':'VARCHAR','clc_secteur':'VARCHAR',
       |  'fk_arb_etat':'VARCHAR','fk_stadedev':'VARCHAR',
       |  'feuillage':'VARCHAR','remarquable':'VARCHAR'})""".stripMargin

  private[graft] val csvFixtureSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("X", DoubleType), StructField("Y", DoubleType),
      StructField("haut_tot", DoubleType), StructField("haut_tronc", DoubleType),
      StructField("tronc_diam", DoubleType), StructField("age_estim", DoubleType),
      StructField("clc_quartier", StringType), StructField("clc_secteur", StringType),
      StructField("fk_arb_etat", StringType), StructField("fk_stadedev", StringType),
      StructField("feuillage", StringType), StructField("remarquable", StringType)))
  }

  // ------------------------------------------------------------- oracle SQL

  /** DuckDB SQL for the Lambert-93 inverse: identical constants and op
    * sequence as [[Lambert93]], latitude iteration unrolled via chained
    * SELECT * REPLACE. */
  private[graft] def lambertOracle: String = {
    val n = "0.725607765053267"
    val c = "11754255.426096"
    val e = "0.08181919104281579"
    val iter = "SELECT * REPLACE (2*atan(pow((1 + " + e + "*sin(phi))/(1 - " + e +
      "*sin(phi)), " + e + "/2) * exp(liso)) - pi()/2 AS phi) FROM "
    val iters = (1 to Lambert93.ITERS)
      .map(i => s"i$i AS ($iter i${i - 1})").mkString(", ")
    s"""WITH base AS (SELECT event_id, 600000.0 + user_id*1000.0 + value AS x,
       |  6600000.0 + value*1000.0 AS y FROM events),
       |c0 AS (SELECT event_id, x, y,
       |  atan2(x - 700000.0, 12655612.049876 - y) AS gamma,
       |  sqrt((x - 700000.0)*(x - 700000.0) + (y - 12655612.049876)*(y - 12655612.049876)) AS r
       |  FROM base),
       |c1 AS (SELECT *, -ln(r / $c) / $n AS liso FROM c0),
       |i0 AS (SELECT *, 2*atan(exp(liso)) - pi()/2 AS phi FROM c1),
       |$iters
       |SELECT event_id,
       |  round(3.0 + gamma / $n * 180.0 / pi(), 6) AS lon,
       |  round(phi * 180.0 / pi(), 6) AS lat
       |FROM i${Lambert93.ITERS}""".stripMargin
  }
}
