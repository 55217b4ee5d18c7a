package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional file-skipping
  * layout: interleaving the bits of several sort dimensions makes rows
  * that are close in EVERY dimension land in the same files, so parquet
  * row-group min/max statistics (and range-partition boundaries) become
  * selective for predicates on ANY of the clustered columns, not just the
  * leading one of a lexicographic sort. This is how large tables keep
  * 2-D/3-D box queries from scanning everything at 100 TB — a layout
  * decision, made once at write time, costing one range shuffle.
  *
  * [[zValue]] is pure codegen'd bit arithmetic (bits·n static shift/mask
  * terms, no lambda, no UDF) and is engine-replayable exactly — the q92
  * oracle recomputes it in DuckDB with the same shifts. Only the low
  * `bits` bits of each column participate (the formula reads bits 0..n-1
  * directly, so no separate masking step exists to get wrong).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of each column (longs;
    * non-negative in the interleaved range). Column j contributes its
    * bit i at output position i·n + j. bits·|cols| must be <= 63. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && bits * n <= 63, s"zValue: $n cols x $bits bits > 63")
    cols.zipWithIndex.flatMap { case (c, j) =>
      val lc = c.cast("long")
      (0 until bits).map { i =>
        shiftleft(shiftright(lc, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numFiles` z-clustered ranges: range-partition on
    * the z-value, sort within partitions, drop the helper column. Written
    * once at layout time; every later scan benefits. (repartitionByRange
    * samples boundaries, so file SPLITS vary run to run — the clustering
    * property, not the exact boundaries, is the contract; ZOrderSpec
    * measures it via files-touched-by-a-box.) */
  def cluster(df: DataFrame, zCols: Seq[Column], numFiles: Int,
              bits: Int = 16): DataFrame = {
    val z = df.withColumn("__z", zValue(zCols, bits))
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
