package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the right row with the greatest
  * timestamp <= the left timestamp within the same key (the time-series
  * enrichment join Spark has no built-in for).
  *
  * Implemented by composition (preference (a) of SURVEY.md §4): tag both
  * sides, union, and carry the latest right payload forward over a
  * (key)-partitioned (ts, tag, tie) ordering — one shuffle on the key, one
  * in-partition sort, zero range explosion. This is the shape that
  * survives 100 TB: no per-row range scan, no broadcast requirement, skew
  * bounded by the hottest key like any window.
  *
  * The whole right payload is carried as ONE struct (non-null per right
  * row), so a null payload FIELD can never tear the match across two
  * different right rows. Right rows sort before left rows at equal ts
  * (tag 0 < 1), so equal timestamps match (<= semantics). If several right
  * rows share (key, ts), the greatest `rightTieBreak` wins.
  */
object AsOfJoin {
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               leftId: String, rightTieBreak: String,
               rightPayloadCols: Seq[String]): DataFrame = {
    val payload = struct(rightPayloadCols.map(col): _*)
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("__tag"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      col(rightTieBreak).cast("long").as("__rtb"),
      payload.as("__p"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("__tag"),
      col(leftId).as("__lid"), lit(null).cast("long").as("__rtb"),
      lit(null).cast(r.schema("__p").dataType).as("__p"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__rtb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((col("__lid").as(leftId) +:
        rightPayloadCols.map(c => col(s"__c.$c").as(s"${c}_asof"))): _*)
  }
}
