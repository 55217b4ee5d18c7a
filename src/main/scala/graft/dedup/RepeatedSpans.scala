package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-span detection — the Spark-shaped analogue of
  * suffix-array ExactSubstr dedup (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022): find, for every document, the
  * maximal token spans whose every k-gram also occurs in at least
  * `minDocs − 1` OTHER documents. Where ExactSubstr builds one giant
  * suffix array, the distributed form is positional k-gram postings: a
  * shared substring of ≥ k tokens shares all its k-grams, so marking
  * globally-duplicated k-gram start positions and merging consecutive
  * positions (the classic gaps-and-islands device) recovers the maximal
  * duplicated spans exactly, up to the k-token resolution floor.
  *
  * Scale shape (the r16 rework — the original postings-join plan measured
  * 152 GB of sort spill at sf100):
  *   - Doc frequency comes from per-doc `array_distinct` gram arrays, so
  *     the partial count agg collapses hot grams map-side and the shuffle
  *     is bounded by distinct-grams-per-partition — the posting-level
  *     (gram, doc) distinct that used to shuffle and hash-aggregate every
  *     posting row is gone.
  *   - Grams travel as 128-bit fingerprints (two independently seeded
  *     xxhash64 draws), never as k-token strings: downstream stages move
  *     fixed 8-byte longs. Collision needs both 64-bit draws to agree —
  *     expected colliding pairs ~ G²/2¹²⁹ ≈ 1e-20 at G = 10¹⁰ distinct
  *     grams, the same fingerprint contract as exact-dedup's q114.
  *   - The duplicated-gram set is byte-gated (`spark.graft.dedup
  *     .broadcastMaxBytes`, default 256 MB, shared with [[Dedup]]): when
  *     it fits, the positional postings stream through a BROADCAST hash
  *     join and are projected to 12-byte (doc, pos) rows without ever
  *     being shuffled or sorted; past the gate the probe falls back to a
  *     shuffled-hash join — still no posting-width external sort, which
  *     is what spilled in the sort-merge plan.
  *   - No checkpoint: each branch re-scans the parquet text. Tokenize +
  *     explode is cheap CPU; materializing ~corpus-sized posting blocks
  *     (the old localCheckpoint) is itself a storage hazard at scale, and
  *     recompute-over-materialize is the right trade for narrow,
  *     cheap-to-rebuild intermediates.
  * No pairwise comparison anywhere — unlike the LSH/PPJoin family this
  * never materializes doc pairs, so its cost is linear in corpus size at
  * any duplication density. */
object RepeatedSpans {

  private def h1(c: Column): Column = xxhash64(c)
  private def h2(c: Column): Column = xxhash64(c, lit(0x9E3779B97F4A7C15L))

  /** Per-document duplicated-span profile. Returns one row per input doc:
    * (idCol, n_dup_grams, n_spans, max_span_tokens, dup_frac) where
    * n_dup_grams counts k-gram start positions whose gram occurs in
    * ≥ `minDocs` distinct docs, n_spans counts maximal runs of such
    * positions, max_span_tokens = longest run + k − 1 (its token length),
    * and dup_frac = n_dup_grams / max(n_grams, 1) rounded 6 dp. */
  def perDoc(df: DataFrame, textCol: String, idCol: String,
             k: Int = 5, minDocs: Int = 2): DataFrame = {
    // tokenize in its own projection so the n-gram HOF reads an attribute,
    // not a re-evaluated split (see Text.ngramsFromTokens). Pre-shuffled
    // by doc id: the input's row-group layout bounds scan parallelism
    // (measured at sf0.1: each branch's tokenize+gram pass serialized on
    // one task), and the narrow (id, text) shuffle costs far less than
    // the gram work it parallelizes — recompute-over-materialize is
    // unchanged, each recompute just runs wide (r17).
    val base = df.repartition(widePartitions(df), col(idCol))
      .select(col(idCol).as("__id"),
        Text.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), size(col("__toks")).cast("long").as("__nt"),
        Text.ngramsFromTokens(col("__toks"), k).as("__grams"))
    // doc frequency per gram: each doc contributes each distinct gram
    // exactly once (array_distinct BEFORE exploding), so a plain count
    // IS the distinct-doc count and the partial agg collapses boilerplate
    // grams inside the scan task — no posting-level distinct, no second
    // agg level. Lineage-truncated lazily: the byte-gate count below is
    // the one action that materializes it, and the join re-reads blocks.
    val dup = graft.io.Checkpoints.truncate(
      base.select(explode(array_distinct(col("__grams"))).as("__g"))
        .select(h1(col("__g")).as("__h1"), h2(col("__g")).as("__h2"))
        .groupBy("__h1", "__h2").agg(count(lit(1)).as("__docs"))
        .filter(col("__docs") >= minDocs)
        .select("__h1", "__h2"),
      eager = false)
    // byte gate (one action, same contract as Dedup.hashJoinSide): a
    // fingerprint row is 16 B payload + ~64 B row overhead in the
    // broadcast relation. Under the gate the postings NEVER shuffle for
    // dup-ness; over it, shuffled-hash keeps the posting stream unsorted.
    val maxBytes = df.sparkSession.conf
      .get("spark.graft.dedup.broadcastMaxBytes", (256L << 20).toString).toLong
    val dupSide =
      if (dup.count() * 80L <= maxBytes) broadcast(dup)
      else dup.hint("shuffle_hash")
    // project to 12-byte (id, pos) the moment dup-ness is decided — the
    // per-doc island window sorts minimal rows, not posting-width ones
    val dupPos = base
      .select(col("__id"), posexplode(col("__grams")))
      .select(col("__id"), (col("pos") + 1).as("__pos"),
        h1(col("col")).as("__h1"), h2(col("col")).as("__h2"))
      .join(dupSide, Seq("__h1", "__h2"))
      .select(col("__id"), col("__pos"))
    val islands = dupPos
      .withColumn("__island", col("__pos") - row_number().over(
        Window.partitionBy("__id").orderBy("__pos")))
      .groupBy(col("__id"), col("__island"))
      .agg(count(lit(1)).as("__ilen"))
    val agg = islands.groupBy("__id").agg(
      sum(col("__ilen")).as("__ndup"),
      count(lit(1)).as("__nspans"),
      (max(col("__ilen")) + (k - 1)).as("__maxspan"))
    base.join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__ndup"), lit(0L)).as("n_dup_grams"),
        coalesce(col("__nspans"), lit(0L)).as("n_spans"),
        coalesce(col("__maxspan"), lit(0L)).as("max_span_tokens"),
        round(coalesce(col("__ndup"), lit(0L)).cast("double") /
          greatest(col("__nt") - (k - 1), lit(1L)), 6).as("dup_frac"))
  }
  /** Pinned width for the pre-tokenize repartition: a by-key repartition
    * without an explicit count is AQE-coalescible, and the tiny
    * pre-explode input bytes make AQE collapse it back to 1-2 partitions
    * (r17; the ngramJaccardSelfPairs pinning rule). */
  private def widePartitions(df: DataFrame): Int =
    scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(200)

}
