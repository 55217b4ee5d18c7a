package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, the right row with the nearest timestamp
  * within the same key — backward (greatest ts <= left ts), forward
  * (smallest ts >= left ts), or nearest (min |ts diff|, backward on ties).
  * The time-series enrichment join Spark has no built-in for.
  *
  * All three are implemented by composition (preference (a) of SURVEY.md
  * §4): tag both sides, union, and carry the right payload across a
  * (key)-partitioned in-partition sort — one shuffle on the key, one sort,
  * zero range explosion. This is the shape that survives 100 TB: no
  * per-row range scan, no broadcast requirement, skew bounded by the
  * hottest key like any window.
  *
  * The whole right payload is carried as ONE struct (non-null per right
  * row), so a null payload FIELD can never tear the match across two
  * different right rows. The struct also carries the right timestamp
  * (`__rts`, cast to double — monotonic for numeric and timestamp
  * columns), which implements `toleranceSecs`: a match farther than the
  * tolerance is nulled out AFTER the carry (pandas `merge_asof`
  * semantics — the left row survives, unenriched; a nearer-but-
  * out-of-tolerance right row does NOT let a farther in-tolerance one
  * win, exactly like pandas).
  *
  * Tie rules (engine-independent, spec-pinned): equal timestamps satisfy
  * both <= and >=. Among right rows sharing (key, ts), BACKWARD takes the
  * greatest `rightTieBreak` (the last row at-or-before the left row in
  * ascending order) and FORWARD the smallest (the first row at-or-after) —
  * each direction picks the right row "closest" to the left row in time
  * order. NEAREST resolves equal |distance| to the backward match.
  */
object AsOfJoin {

  /** Tagged union of the two sides: right rows carry (__rtb, __p), left
    * rows carry __lid; __tag orders right rows before left rows at equal
    * ts so equality matches in both directions. The payload struct always
    * leads with `__rts`, the right timestamp as double. */
  private def tagged(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, leftId: String, rightTieBreak: String,
                     rightPayloadCols: Seq[String]): DataFrame = {
    val payload = struct((col(tsCol).cast("double").as("__rts") +:
      rightPayloadCols.map(col)): _*)
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("__tag"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      col(rightTieBreak).cast("long").as("__rtb"),
      payload.as("__p"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("__tag"),
      col(leftId).as("__lid"), lit(null).cast("long").as("__rtb"),
      lit(null).cast(r.schema("__p").dataType).as("__p"))
    r.unionByName(l)
  }

  /** Null out a carried match farther than `toleranceSecs` (distance =
    * signed |left ts − right ts| supplied by the caller, always >= 0 for
    * its direction). */
  private def withinTolerance(chosen: Column, dist: Column,
                              toleranceSecs: Option[Double]): Column =
    toleranceSecs match {
      case Some(t) => when(chosen.isNotNull && dist <= lit(t), chosen)
      case None    => chosen
    }

  private def project(df: DataFrame, leftId: String,
                      rightPayloadCols: Seq[String]): DataFrame =
    df.filter(col("__tag") === 1)
      .select((col("__lid").as(leftId) +:
        rightPayloadCols.map(c => col(s"__c.$c").as(s"${c}_asof"))): _*)

  /** Backward: the right row with the greatest timestamp <= the left
    * timestamp (within `toleranceSecs`, if given). Greatest
    * `rightTieBreak` wins equal (key, ts). */
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               leftId: String, rightTieBreak: String,
               rightPayloadCols: Seq[String],
               toleranceSecs: Option[Double] = None): DataFrame = {
    val u = tagged(left, right, keyCol, tsCol, leftId, rightTieBreak, rightPayloadCols)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__rtb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = last(col("__p"), ignoreNulls = true).over(w)
    val lts = col(tsCol).cast("double")
    project(
      u.withColumn("__c0", carried)
        .withColumn("__c",
          withinTolerance(col("__c0"), lts - col("__c0.__rts"), toleranceSecs)),
      leftId, rightPayloadCols)
  }

  /** Forward: the right row with the smallest timestamp >= the left
    * timestamp (within `toleranceSecs`, if given). Mirror of [[backward]]
    * — descending time, right rows still first at equal ts (>= matches
    * equality), tie order reversed so the SMALLEST `rightTieBreak` wins
    * equal (key, ts). */
  def forward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
              leftId: String, rightTieBreak: String,
              rightPayloadCols: Seq[String],
              toleranceSecs: Option[Double] = None): DataFrame = {
    val u = tagged(left, right, keyCol, tsCol, leftId, rightTieBreak, rightPayloadCols)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("__tag").asc, col("__rtb").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = last(col("__p"), ignoreNulls = true).over(w)
    val lts = col(tsCol).cast("double")
    project(
      u.withColumn("__c0", carried)
        .withColumn("__c",
          withinTolerance(col("__c0"), col("__c0.__rts") - lts, toleranceSecs)),
      leftId, rightPayloadCols)
  }

  /** Nearest: whichever of the backward/forward matches is closer in
    * |ts diff| (and within `toleranceSecs`, if given); equal distance
    * (including an exact-ts match, distance 0) resolves backward. ONE
    * union and ONE sort compute both directions — the backward carry
    * looks at the preceding frame, the forward carry at the following
    * frame of the same ascending order. (Right rows at the left row's
    * exact ts sort before it, so they are found by the backward frame at
    * distance 0 — which wins by the tie rule — making their absence from
    * the forward frame immaterial.) Tolerance is applied per direction
    * BEFORE choosing, so an out-of-tolerance nearer side correctly loses
    * to an in-tolerance farther side. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
              leftId: String, rightTieBreak: String,
              rightPayloadCols: Seq[String],
              toleranceSecs: Option[Double] = None): DataFrame = {
    val u = tagged(left, right, keyCol, tsCol, leftId, rightTieBreak, rightPayloadCols)
    val ord = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__rtb").asc_nulls_first)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = ord.rowsBetween(0, Window.unboundedFollowing)
    val lts = col(tsCol).cast("double")
    val back = col("__b")
    val fwd = col("__f")
    project(
      u.withColumn("__b0", last(col("__p"), ignoreNulls = true).over(wBack))
        .withColumn("__f0", first(col("__p"), ignoreNulls = true).over(wFwd))
        .withColumn("__b",
          withinTolerance(col("__b0"), lts - col("__b0.__rts"), toleranceSecs))
        .withColumn("__f",
          withinTolerance(col("__f0"), col("__f0.__rts") - lts, toleranceSecs))
        .withColumn("__c",
          when(back.isNull, fwd)
            .when(fwd.isNull, back)
            .when(fwd("__rts") - lts < lts - back("__rts"), fwd)
            .otherwise(back)),
      leftId, rightPayloadCols)
  }
}
