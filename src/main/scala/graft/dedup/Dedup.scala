package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard near-dup detection.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is one hash aggregation; MinHash/SimHash bucket by signature
  * bands so candidate generation is an equi-join on band keys (shuffle on
  * band hash, linear in candidates); only the verification step touches
  * pairs, and only within buckets. This is the standard web-scale pipeline
  * (shingle → minhash → band → bucket-join) and holds at 100 TB: band keys
  * distribute uniformly, and skewed buckets (boilerplate duplicates) are
  * exactly the rows one *wants* colliding.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id as canonical.
    * One shuffle on the (64-bit, uniform) hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the document's k-shingle hashes. Pure HOF expression —
    * one pass, no explode. Empty docs get an empty signature. */
  def minHashSignature(toks: Column, k: Int, numHashes: Int): Column = {
    val seeds = array((0 until numHashes).map(lit): _*)
    transform(seeds, s =>
      array_min(transform(
        sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(k))), s))))
  }

  /** MinHash + LSH candidate pairs: signatures are cut into `bands` bands of
    * `rowsPerBand` hashes; documents sharing any band bucket become a
    * candidate pair, then candidates are verified by estimated Jaccard
    * (fraction of agreeing minhashes) >= `threshold`.
    *
    * Physical shape: explode to (doc, band, bandHash) — |docs|·bands rows —
    * self-equi-join on (band, bandHash), dedup pairs. No cross join at any
    * scale. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                 threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = df
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .withColumn("sig", minHashSignature(col("toks"), k, numHashes))
      .select(col("id"), col("sig"))
    val banded = sigs.withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("band_hash", xxhash64(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select(col("id"), col("sig"), col("band"), col("band_hash"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash: 64-bit locality-sensitive fingerprint. Each token hash votes
    * ±1 per bit position; the sign vector becomes the fingerprint. Near-dups
    * differ in few bits (Hamming distance). Pure HOF fold over the token
    * array — no explode, no shuffle. */
  def simHash(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc,
          array((0 until 64).map(b =>
            when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*),
          (x, y) => x + y)
      })
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup candidates by block partitioning (Charikar/Manku):
    * split the 64-bit fingerprint into `blocks` blocks; dups within Hamming
    * distance `maxHamming < blocks` must agree on at least one block →
    * equi-join per block, verify exact Hamming via bit_count(xor). */
  def simHashDups(df: DataFrame, textCol: String, idCol: String,
                  blocks: Int = 4, maxHamming: Int = 3): DataFrame = {
    val width = 64 / blocks
    val withSig = df.select(col(idCol).as("id"), simHash(Text.tokens(col(textCol))).as("sim"))
    val mask = if (width == 64) -1L else (1L << width) - 1
    val blockStructs = array((0 until blocks).map(b => struct(
      lit(b).as("blk"),
      shiftrightunsigned(col("sim"), b * width).bitwiseAND(mask).as("blk_val"))): _*)
    val blocked = withSig.withColumn("bb", explode(blockStructs))
      .withColumn("blk", col("bb.blk")).withColumn("blk_val", col("bb.blk_val"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.blk_val") === col("b.blk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (the verification
    * oracle for the LSH variants, or a small-side sweep when one side is a
    * bounded probe set). jaccard = |A∩B| / |A∪B| over distinct k-shingle
    * hash sets. */
  def ngramJaccardPairs(probe: DataFrame, corpus: DataFrame,
                        textCol: String, idCol: String,
                        k: Int = 3, threshold: Double = 0.3): DataFrame = {
    def prep(d: DataFrame, suffix: String) = d.select(
      col(idCol).as(s"id_$suffix"),
      array_distinct(Text.shingleHashes(Text.tokens(col(textCol)), k)).as(s"sh_$suffix"))
    prep(probe, "a").crossJoin(prep(corpus, "b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
