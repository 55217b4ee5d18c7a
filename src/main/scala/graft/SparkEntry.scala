package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full query surface lives in [[Queries]] (one named query per
  * SURVEY.md §2 operator + the LLM-data-pipeline operators); library
  * operators live under `graft.operators` / `graft.stats` / `graft.text` /
  * `graft.dedup` / `graft.similarity` / `graft.ml` / `graft.streaming` /
  * `graft.multimodal` / `graft.functions`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash signatures, spark.ml models, LSH buckets) → driver
    * records a weaker rows-only check for those. */
  def oracleSql: Map[String, String] = Queries.oracle
}
