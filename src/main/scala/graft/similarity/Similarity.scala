package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two tiers, per the standard vector-search playbook:
  *  - [[cosineTopK]]: brute-force exact top-k — the correctness baseline.
  *    Linear in |queries|·|corpus|; right answer when the probe set is
  *    bounded (dedup audits, eval queries).
  *  - [[lshCosineTopK]]: random-hyperplane LSH — the 100 TB path. Corpus is
  *    bucketed once by an nBits-bit hyperplane signature (a linear scan);
  *    each query probes only its bucket (+ optional multi-probe neighbors),
  *    turning the search into an equi-join on bucket ids. Recall tunes via
  *    nBits/multi-probe; verified against the brute-force tier in tests.
  *
  * Dot products are sequential left-fold `aggregate` over `zip_with` in
  * double precision — deterministic, codegen-friendly, no UDF.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force cosine top-k: every query row against every corpus
    * row, ranked per query with a deterministic (sim desc, id asc) order.
    * The query side is broadcast — the corpus is scanned once, never
    * shuffled. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nv"))
    val sim = dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .withColumn("cos_sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  /** Random-hyperplane signature of a double-array column as an Int bucket
    * id: bit p = sign(v · h_p), seed fixed so buckets are stable across
    * runs and cluster topologies. Buckets split the corpus ~uniformly
    * (each hyperplane halves it), so the downstream equi-join sees
    * |corpus|/2^n candidates per probe. Tight-loop custom expression
    * ([[graft.functions.HyperplaneSig]]). */
  def hyperplaneSignature(vec: Column, nBits: Int, dim: Int): Column =
    graft.functions.HyperplaneSig(vec, nBits, dim)

  /** LSH-bucketed ANN: equi-join query and corpus on the signature bucket
    * (multi-probe: also the nBits single-bit-flip neighbor buckets of the
    * query, recovering most near-boundary misses), then exact rank within
    * candidates. */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nBits: Int = 8, dim: Int = 64, multiProbe: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nv"))
      .withColumn("bucket", hyperplaneSignature(col("nv"), nBits, dim))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("sig", hyperplaneSignature(col("qv"), nBits, dim))
    val probes =
      if (!multiProbe) array(col("sig"))
      else array((col("sig") +: (0 until nBits).map(b => col("sig").bitwiseXOR(lit(1 << b)))): _*)
    val q = q0.withColumn("bucket", explode(probes)).drop("sig")
    val sim = dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .withColumn("cos_sim", sim)
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }
}
