package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style table digest — the data-integrity audit for a 100 TB
  * export/copy: two engines computing the same root proves the copy
  * byte-identical without moving rows (the q239 surface).
  *
  * Shape: per-row md5 over the audited columns → hex-prefix buckets →
  * per-bucket digest of the SORTED row hashes → root digest of the
  * SORTED bucket digests. Sorting inside each digest level makes the
  * result independent of partitioning and row order, so any two runs
  * (or engines) over the same logical table agree.
  *
  * `prefixChars` sets the fan-out: 16^prefixChars buckets, so expected
  * per-bucket state is |rows| / 16^prefixChars row hashes (32 B each).
  * The collect_list per bucket is the deliberate trade — one shuffle,
  * exact digests — and the width is how it scales: 2 chars (256
  * buckets) suits fixture-to-GB tables; a 100 TB table at ~10¹¹ rows
  * wants 6-7 chars (16⁶ ≈ 16M buckets → ~6k hashes ≈ 200 KB per
  * group). Width is part of the digest contract: both sides of a
  * comparison must use the same `prefixChars` (different widths give
  * different — equally valid — roots).
  */
object MerkleAudit {

  /** Bucket digests + one `__root` row for `df` audited over `cols`.
    * Output: (bucket: string, digest: string); the root row's bucket is
    * the literal `__root`.
    *
    * Row encoding (part of the digest contract): each column hashes
    * SEPARATELY — md5 of its string form, null → the literal `-` — and
    * the row hash is md5 over the concatenation of those fixed-width
    * tokens. A delimiter-join encoding (`md5(concat_ws("|", cols))`)
    * would collide ("a|b","c") with ("a","b|c") and null with
    * empty-string — silent false negatives for an operator whose job is
    * proving a copy byte-identical. The token stream here is
    * unambiguous: every non-null column contributes exactly 32 hex
    * chars, nulls contribute the single non-hex char `-`, so no two
    * distinct column tuples share an encoding. */
  def tableDigest(df: DataFrame, cols: Seq[Column], prefixChars: Int = 2): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars in [1, 8] (16^$prefixChars buckets): $prefixChars")
    val h = df.select(
      md5(concat(cols.map(c =>
        coalesce(md5(c.cast("string")), lit("-"))): _*)).as("h"))
    val buckets = h.withColumn("bucket", substring(col("h"), 1, prefixChars))
      .groupBy("bucket")
      .agg(md5(array_join(array_sort(collect_list(col("h"))), ""))
        .as("digest"))
    val root = buckets
      .agg(md5(array_join(array_sort(collect_list(col("digest"))), ""))
        .as("digest"))
      .select(lit("__root").as("bucket"), col("digest"))
    buckets.unionByName(root)
  }
}
