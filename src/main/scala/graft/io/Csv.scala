package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (SURVEY.md §2.1 S1-S3; ref `R_groupe4.R:41,1074`).
  *
  * Schema is declared, not inferred (inference = an extra full scan and
  * nondeterministic types at scale); reads are PERMISSIVE by default with a
  * corrupt-record column so bad rows are quarantined, not dropped silently.
  */
object Csv {
  /** S1 — header CSV scan with explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
           failFast: Boolean = false): DataFrame =
    spark.read
      .option("header", true)
      .option("encoding", "UTF-8")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** S2 — header CSV sink. `singleFile` mirrors the reference's one-file
    * export (fine for small results; large exports keep natural
    * partitioning — one file per task — so the write stays parallel). */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", true).mode("overwrite").csv(path)
  }

  /** S3 — round-trip re-read (the reference's only "test",
    * `R_groupe4.R:1075-1077`). */
  def roundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    write(df, path, singleFile = false)
    spark.read.option("header", true).schema(df.schema).csv(path)
  }
}
