package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * LLM corpora actually arrive in. Same contract as [[Csv]]: schema is
  * DECLARED (inference = one extra full corpus scan at 100 TB, and
  * type-unstable under evolving producers), reads are PERMISSIVE with a
  * quarantine column so malformed lines surface as data instead of
  * failing the job or vanishing silently.
  */
object Jsonl {
  val CorruptCol = "_corrupt_record"

  /** Declared-schema JSONL scan. With `quarantine = true` the schema is
    * widened with a `_corrupt_record` string column: well-formed rows
    * parse normally (corrupt col null), malformed lines land whole in the
    * corrupt col with every data column null. (Spark caveat, documented:
    * a query selecting ONLY the corrupt column is disallowed — keep at
    * least one data column, which real quarantine triage does anyway.) */
  def read(spark: SparkSession, path: String, schema: StructType,
           quarantine: Boolean = true, failFast: Boolean = false): DataFrame = {
    val s =
      if (quarantine && !schema.fieldNames.contains(CorruptCol))
        StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
      else schema
    spark.read
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(s)
      .json(path)
  }

  /** JSONL sink — one file per task (parallel); callers wanting few large
    * files compose with [[Compact]]. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
