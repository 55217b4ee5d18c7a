package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver test data (TESTDATA.md).
  *
  * Mirrors the reference's single CSV scan (`R_groupe4.R:41-42`) generalized
  * to a multi-table parquet catalog. Reads are lazy; Catalyst pushes filters
  * and prunes columns into the parquet scan, so callers should select/filter
  * on the returned DataFrame directly rather than caching.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  /** Normalize `ts` to the engine's canonical `TimestampType`, whatever the
    * parquet footer stored. The driver has regenerated `events.parquet` with
    * different footer types across rounds, so this must branch on the schema
    * actually read rather than assume one encoding:
    *   - `LongType`: footer was TIMESTAMP(NANOS) read under
    *     `spark.sql.legacy.parquet.nanosAsLong` — floor-convert to µs
    *     (the data is µs-precision, so lossless).
    *   - `TimestampNTZType`: footer is timestamp[us] without UTC adjustment —
    *     the session time zone is pinned to UTC everywhere (Verify/Bench/
    *     tests), so the cast is value-preserving and matches DuckDB's
    *     epoch-based reads of the same file.
    *   - `TimestampType`: already canonical.
    * Any other type fails loudly: a one-assertion failure beats 57 crashed
    * queries the next time the driver changes the footer. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet-decoded type $other (expected LongType nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Harmless when the footer is µs; required to read TIMESTAMP(NANOS) footers.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(spark, dir, "events"))
  }

  /** Raw events schema (ts as long nanos) for streaming sources. */
  def eventsRawSchema(spark: SparkSession, dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
