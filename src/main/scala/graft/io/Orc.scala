package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar interchange format large
  * warehouses hand over (Hive-era lakes are ORC, not parquet). Same
  * contract as [[Csv]]/[[Jsonl]]: the schema is DECLARED, never inferred
  * — at 100 TB an inference pass is a full extra scan, and ORC footers
  * from heterogeneous producers can disagree; a declared schema makes the
  * read plan (and its column pruning / predicate pushdown, which Spark's
  * ORC reader supports just like parquet's) deterministic.
  */
object Orc {

  /** Declared-schema ORC scan. Column pruning and predicate pushdown
    * reach the ORC stripes exactly as with parquet. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC sink — one file per task (parallel writers); callers wanting few
    * large files compose with [[Compact]]. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
