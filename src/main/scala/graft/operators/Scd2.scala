package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: turn a changelog
  * (key, change-time, attributes) into validity intervals
  * [valid_from, valid_to) per key — `valid_to` is the NEXT change's time
  * (null for the current row), the warehouse-standard point-in-time-join
  * substrate (pairs with [[AsOfJoin]] for "attribute as of t" lookups).
  *
  * One `lead` window per key partition — shuffle on key, per-group sort by
  * (time, tiebreak). The tiebreak column makes the order total when a key
  * has simultaneous changes (same timestamp), so the intervals are
  * deterministic and engine-replayable. Keys are independent, so the
  * window parallelizes across the key hash space at any scale; no global
  * sort, no driver state. */
object Scd2 {

  def intervals(changelog: DataFrame, keyCol: String, tsCol: String,
                tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    changelog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
