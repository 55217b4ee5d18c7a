package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for memory-bound ANN (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * 100 TB similarity-search memory path: a d-dim float vector becomes
  * `blocks` one-byte codes (here 64 floats → 4 codes, a 64× compression),
  * and query-time distance is an additive lookup (ADC) instead of a float
  * fold over the raw vector.
  *
  * Training: an independent [[KMeans]] per dimension block (the engine's
  * replayable Lloyd's — lowest-id init, 6-dp rounded means), so the whole
  * codebook derivation is oracle-replayable SQL. Codebooks are k·d/blocks
  * doubles — driver literals, like the IVF centroid table.
  *
  * Encode + query plan shape: ONE projection over the corpus — nearest
  * codeword per block is a `least` over codebook-size literal structs,
  * and the probe's ADC term per block is a literal code→distance lookup
  * map (the classic per-query LUT). Zero shuffle for encode and scoring;
  * the only aggregation anywhere is the tiny per-block training agg and
  * the final TakeOrdered top-k. */
object ProductQuantizer {

  /** Per-block codebooks: block b covers vector dims [b·sub+1, (b+1)·sub].
    * Returns (block, codewordId, centroid) — codeword ids are the q105
    * lowest-id-init cluster labels. */
  def trainCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
                     blocks: Int, codebookSize: Int, iters: Int)
      : Seq[(Int, Seq[(Long, Array[Double])])] = {
    val v = vecs.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val dims = v.select(size(col("__v"))).first().getInt(0)
    require(dims % blocks == 0, s"pq: $dims dims not divisible by $blocks")
    val sub = dims / blocks
    (0 until blocks).map { b =>
      val sv = v.select(col(idCol), slice(col("__v"), b * sub + 1, sub).as("__v"))
      var centroids: Seq[(Long, Array[Double])] =
        sv.orderBy(idCol).limit(codebookSize).collect()
          .map { r =>
            val id = r.get(0) match { case l: Long => l; case i: Int => i.toLong }
            id -> r.getSeq[Double](1).toArray
          }.sortBy(_._1).toSeq
      var i = 1
      while (i < iters) {
        centroids = KMeans.roundedMeans(
          KMeans.assign(sv, idCol, "__v", centroids), "__v", sub)
        i += 1
      }
      b -> centroids
    }
  }

  /** Top-k nearest to the `probeId` vector by PQ-ADC distance: encode the
    * corpus against the trained codebooks and score every row with the
    * probe's per-block code→distance LUT, all in one shuffle-free
    * projection. Returns (rank, idCol, adc) for the `topK` closest by
    * (adc rounded 6 dp, id). */
  def adcTopK(vecs: DataFrame, idCol: String, vecCol: String,
              blocks: Int = 4, codebookSize: Int = 16, iters: Int = 2,
              probeId: Long = 0L, topK: Int = 10): DataFrame = {
    val codebooks = trainCodebooks(vecs, idCol, vecCol, blocks, codebookSize, iters)
    val v = vecs.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val dims = v.select(size(col("__v"))).first().getInt(0)
    val sub = dims / blocks
    val probe = v.filter(col(idCol) === probeId)
      .select(col("__v")).first().getSeq[Double](0).toArray
    // per-block: nearest codeword id (least over literal structs), then
    // the probe-side ADC term via a literal lookup map — sequential adds
    // in ascending block order keep the sum bit-deterministic
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val adcTerms = codebooks.map { case (b, cws) =>
      val sv = slice(col("__v"), b * sub + 1, sub)
      val terms = cws.toIndexedSeq.map { case (cid, cw) =>
        struct(
          aggregate(zip_with(sv, array(cw.map(lit).toIndexedSeq: _*),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("d"),
          lit(cid).as("cid"))
      }
      val nearest =
        if (terms.size == 1) terms.head.getField("cid") else least(terms: _*).getField("cid")
      val probeBlock = probe.slice(b * sub, (b + 1) * sub)
      val lut = map(cws.flatMap { case (cid, cw) =>
        Seq(lit(cid), lit(dist2(probeBlock, cw)))
      }.toIndexedSeq: _*)
      element_at(lut, nearest)
    }
    val adc = round(adcTerms.reduce(_ + _), 6)
    val scored = v.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol)).limit(topK)
    // rank over the collected top-k only (topK rows — not a corpus window)
    scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("adc"), col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("adc"))
  }
}
