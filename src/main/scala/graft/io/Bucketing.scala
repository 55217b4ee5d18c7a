package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for repeat-join workloads: co-partition + co-sort
  * both sides of a hot join key at write time so every subsequent
  * sort-merge join on that key runs with NO shuffle exchange and NO sort
  * (the scan itself satisfies the join's distribution+ordering
  * requirement). At 100 TB this converts the dominant per-query cost of a
  * fact-fact join into a one-time layout cost. */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
