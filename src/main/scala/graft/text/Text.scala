package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are pure column expressions (no UDFs, no shuffles) — they scale
  * embarrassingly: a 100 TB corpus maps through these at parquet-scan speed
  * with filters/projections pushed down.
  *
  * Where the formula must also be runnable by an external SQL oracle, only
  * exact string/integer arithmetic is used (occurrence counts via
  * length-difference, not regex engines with divergent semantics).
  */
object Text {

  /** Whitespace token count via length difference — exact, allocation-free,
    * and expressible identically in any SQL dialect (single-space separated
    * corpus convention). A BPE-ish regex tokenizer is [[tokenizeRegex]]. */
  def tokenCount(c: Column): Column =
    (length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long")

  /** BPE-ish pre-tokenization: word / number / punctuation runs, the usual
    * first step of byte-pair encoders. */
  def tokenizeRegex(c: Column): Column =
    regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  /** Whitespace tokens as an array (for shingling). */
  def tokens(c: Column): Column = split(c, " ")

  /** Token n-grams as strings (empty array when the doc has fewer than n
    * tokens — `sequence` would otherwise count DOWN and fabricate grams). */
  def ngramStrings(c: Column, n: Int): Column =
    ngramsFromTokens(tokens(c), n)

  /** Token n-grams from an ALREADY-TOKENIZED array column.
    *
    * Callers that explode the grams should tokenize in their OWN
    * projection and pass the attribute here: higher-order functions are
    * not whole-stage-codegen'd, so a `split(...)` expression passed as
    * `toks` is re-evaluated per gram position inside the lambda —
    * O(tokens²) re-splitting per document (measured 15× on q182's
    * postings build). An attribute reference is read once per row.
    * (CollapseProject keeps the two projections separate precisely
    * because the alias is referenced more than once and split isn't
    * cheap.) */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Duplicate n-gram fraction — the Gopher-style repetition signal used
    * to drop boilerplate/spam from pretraining corpora: the share of a
    * document's n-grams that are repeats of an earlier one
    * (1 − distinct/total; 0 for docs too short to have any). Pure
    * codegen'd column arithmetic per row — no shuffle, no explode: the
    * gram array lives and dies inside the projection. Rounded to 6 dp for
    * cross-engine parity (the ratio is a division of exact integers). */
  def dupNgramFraction(c: Column, n: Int = 3): Column = {
    val g = ngramStrings(c, n)
    val total = size(g)
    when(total > 0,
      round((total - size(array_distinct(g))).cast("double") / total.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Occurrences of literal `needle` via length difference — deterministic
    * across engines (no regex). */
  def occurrences(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) / lit(needle.length))

  /** Quality-score feature set: length, token count, mean token length,
    * space ratio, stopword share. Each a plain column so callers compose
    * their own score. */
  def qualityFeatures(c: Column): Seq[(String, Column)] = {
    val nChars = length(c).cast("long")
    val nToks  = tokenCount(c)
    Seq(
      "n_chars_q"      -> nChars,
      "n_tokens"       -> nToks,
      "avg_token_len"  -> (nChars - (nToks - 1)).cast("double") / nToks,
      "space_ratio"    -> (nToks - 1).cast("double") / nChars,
      "stopword_share" -> (occurrences(c, " the ") + occurrences(c, " a ") +
        occurrences(c, " and ") + occurrences(c, " of ")) / nToks)
  }

  /** Language-ID by stopword evidence: count distinctive function words per
    * language, argmax with a fixed priority tie-break (declaration order).
    * The n-gram heuristic of fastText-style LID reduced to exact arithmetic
    * so the same formula runs on any engine. 'unknown' when no evidence. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "fr" -> Seq(" le ", " la ", " et "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " y "))

  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(occurrences(c, _)).reduce(_ + _)

  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("unknown")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint: 64-bit content hash (xxhash64) of the
    * whitespace-normalized text — the exact-dedup key. */
  def fingerprint(c: Column): Column =
    xxhash64(regexp_replace(trim(c), "\\s+", " "))

  /** Hashes of all k-token shingles of a token array — the shared substrate
    * of MinHash, winnowing, and n-gram Jaccard. Tight-loop custom
    * expression ([[graft.functions.ShingleHashes]]), bit-identical to the
    * pure-HOF `transform(sequence(...), i -> xxhash64(concat_ws(" ",
    * slice(...))))` formulation it replaced (TextDedupSpec pins the
    * equivalence) but ~one order of magnitude cheaper per document: one
    * JVM loop instead of an expression-tree eval per shingle. */
  def shingleHashes(toks: Column, k: Int): Column =
    graft.functions.ShingleHashes(toks, k)

  /** Rolling / winnowing fingerprint (MOSS scheme): minimum shingle hash in
    * each window of `w` consecutive shingles — a compact Array[Long]
    * signature robust to local edits. */
  def winnowingFingerprint(toks: Column, k: Int = 3, w: Int = 4): Column = {
    val sh = shingleHashes(toks, k)
    array_distinct(transform(
      sequence(lit(0), greatest(size(sh) - w, lit(0))),
      j => array_min(slice(sh, j + lit(1), lit(w)))))
  }
}
