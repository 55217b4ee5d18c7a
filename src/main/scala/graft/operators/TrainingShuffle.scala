package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle: every row gets a dense
  * rank in a pseudo-random but REPRODUCIBLE total order — the "shuffle
  * the corpus once per epoch" step of an LLM training pipeline, without
  * `rand()` (non-replayable, changes under retry/speculation) and without
  * the single-partition `row_number() OVER (ORDER BY …)` window (the q84
  * scale cliff).
  *
  * Order key = md5(seed ‖ id): cryptographic mixing makes the order
  * uncorrelated with ingest order, and changing `seed` ("epoch2", …)
  * yields an independent permutation while staying bit-reproducible
  * across runs, engines, and task retries.
  *
  * The rank is the same two-phase decomposition as
  * [[graft.text.SequencePack]]'s prefix sum, specialised to counting:
  *
  *   1. rows bucket by the key's first two hex digits — 256 contiguous
  *      key ranges, uniform by construction (md5 output is uniform), so
  *      no sampling pass (unlike repartitionByRange) and no skew;
  *   2. per-bucket `row_number()` — windows partitioned BY bucket, all
  *      256 in parallel;
  *   3. bucket counts (256 rows) get the only global running sum —
  *      O(buckets), not O(corpus) — and broadcast back as offsets.
  *
  * global rank = bucket offset + local rank. A trainer then reads
  * `ORDER BY shuffle_rank` ranges, or writes the corpus back partitioned
  * by `shuffle_rank DIV rows_per_shard` for sequential shard reads.
  */
object TrainingShuffle {

  /** md5-hex order key for a row id (lowercase hex in every engine). */
  def shuffleKey(idCol: org.apache.spark.sql.Column, seed: String) =
    md5(concat(lit(seed), idCol.cast("string")))

  /** Adds `shuffle_rank` (BIGINT, 1-based, dense) ordering `df` by
    * md5(seed ‖ idCol). Ties are impossible for distinct ids (equal md5
    * would need equal input strings) but idCol breaks them anyway so the
    * order is total even under id reuse. */
  def shuffleRank(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val keyed = df.withColumn("__key", shuffleKey(col(idCol), seed))
      .withColumn("__bucket", substring(col("__key"), 1, 2))
    val wLocal = Window.partitionBy("__bucket").orderBy(col("__key"), col(idCol))
    val local = keyed.withColumn("__local", row_number().over(wLocal).cast("long"))
    // The only global window: one running sum over ≤256 bucket-count rows.
    val wBuckets = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(wBuckets), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    local.join(F.broadcast(offsets), "__bucket")
      .withColumn("shuffle_rank", col("__offset") + col("__local"))
      .drop("__key", "__bucket", "__local", "__offset")
  }
}
