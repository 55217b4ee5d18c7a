package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction — the tokenizer-training first
  * stage of an LLM data pipeline: iterative "merge the most frequent
  * adjacent symbol pair" rounds (Sennrich et al. 2016) over the corpus
  * word-frequency table — and the matching encode step (apply the learned
  * merges, count BPE tokens).
  *
  * Scale shape: the ONLY corpus-scale operation is the word-frequency
  * hash aggregation (map-side combinable, one shuffle). Every merge round
  * then runs on the |vocab|-row frequency table — bounded by vocabulary,
  * not corpus, which is exactly how production BPE trainers work. The
  * per-round best pair is a 1-row broadcast (no driver collect; the
  * argmax rides `row_number + limit 1` and a crossJoin(broadcast)).
  * Encoding rejoins the |vocab|-row word→length table to the corpus as a
  * broadcast — the corpus side never shuffles.
  *
  * Engine parity: symbol sequences are single-space-delimited strings and
  * a merge is `replace(seq, ' a b ', ' ab ')` applied TWICE — `replace`
  * scans left-to-right non-overlapping in Spark, DuckDB, and every other
  * engine with identical semantics, and the second pass catches the
  * alternate occurrences whose shared boundary space the first pass
  * consumed (' a b a b '). Pair counts are exact integers weighted by
  * word frequency; the best-pair tie-break is lexicographic. BpeSpec pins
  * the replace-semantics parity vector and a hand-computed merge.
  */
object Bpe {

  /** Word-frequency table: one corpus-scale hash agg. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** The shared training loop: returns (final per-word symbol sequences
    * `(w, seq, freq)`, merge table `(round, pair, merged, cnt)`). */
  private def train(df: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1)
    // ' s p a r k ' — leading/trailing spaces so every adjacent pair,
    // including at word edges, is the uniform ' a b ' form. Chars via
    // explicit substring indexing — `split(w, "")` keeps a trailing empty
    // match under Spark's limit=-1 regex split, and engines disagree on
    // empty-pattern splits; 1-based substring is identical everywhere.
    // The corpus-scale word-freq agg is checkpointed ONCE (|vocab| rows):
    // each round consumes `seqs` twice (best + merged) and the unrolled
    // lazy DAG would otherwise recompute the corpus agg 2^rounds times.
    var seqs = graft.io.Checkpoints.truncate(
      wordFreqs(df, textCol).select(
        col("w"),
        concat(lit(" "), array_join(
          transform(sequence(lit(1), length(col("w"))),
            i => col("w").substr(i, lit(1))), " "), lit(" ")).as("seq"),
        col("freq")),
      eager = true)

    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val pairs = seqs
        .select(col("freq"), split(trim(col("seq")), " ").as("sym"))
        .select(col("freq"), explode(
          when(size(col("sym")) >= 2,
            transform(sequence(lit(0), size(col("sym")) - 2),
              i => concat(col("sym")(i), lit(" "), col("sym")(i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("pair").asc)))
        .filter(col("__rn") === 1)
        .select(col("pair"), col("cnt"))
      // the single-partition window above ranks the |pairs| relation —
      // bounded by vocab² in theory, observed ~|vocab|·avg_len in practice;
      // at extreme vocab sizes swap for orderBy(...).limit(1) (same result)
      val merged = seqs.crossJoin(broadcast(best))
        .withColumn("__from", concat(lit(" "), col("pair"), lit(" ")))
        .withColumn("__to",
          concat(lit(" "), regexp_replace(col("pair"), " ", ""), lit(" ")))
        .select(col("w"),
          expr("replace(replace(seq, __from, __to), __from, __to)").as("seq"),
          col("freq"))
      val row = best.select(lit(r).cast("long").as("round"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"), col("cnt"))
      out = if (out == null) row else out.unionByName(row)
      // |vocab|-row truncation per round: keeps the unrolled plan linear
      seqs = if (r < rounds) graft.io.Checkpoints.truncate(merged, eager = true)
             else merged
    }
    (seqs, out)
  }

  /** `rounds` BPE merges; one row per round: (round, pair, merged, cnt). */
  def merges(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    train(df, textCol, rounds)._2

  /** Post-merge BPE token count per word: (w, bpe_tokens) — the trained
    * tokenizer as a |vocab|-row broadcastable lookup. */
  def encodedLengths(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    train(df, textCol, rounds)._1.select(col("w"),
      size(split(trim(col("seq")), " ")).cast("long").as("bpe_tokens"))
}
