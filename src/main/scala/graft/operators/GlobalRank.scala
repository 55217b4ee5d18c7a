package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordered prefix sums — the generalization of the
  * SequencePack two-phase pattern (there: token offsets by id; here: any
  * numeric order column, any weight).
  *
  * A naive `sum(w) OVER (ORDER BY v)` is a SINGLE-partition window over
  * the whole relation — the q84 scale cliff. This operator keeps the
  * computation distributed with the standard two-phase decomposition:
  *
  *   1. rows land in `nBuckets` contiguous VALUE-RANGE buckets (equal-width
  *      over [min, max], bounds from one tiny agg on a broadcast 1-row
  *      cross join — no sampling, no sort);
  *   2. each bucket computes its internal exclusive running sum in
  *      parallel (per-bucket window);
  *   3. bucket totals (nBuckets rows) get their own exclusive running sum
  *      — the only single-partition window, over nBuckets rows, O(1) in
  *      the relation size — and rejoin as offsets.
  *
  * Equal-width buckets skew with the value distribution (unlike
  * SequencePack's id ranges); skewed inputs want quantile cutpoints from
  * the A2 exact-percentile agg instead — the decomposition is unchanged.
  * The result is EXACTLY the global ordered prefix sum whatever the
  * bucketing, so bucket boundaries never leak into the semantics. */
object GlobalRank {

  /** Adds `cum_before` = Σ weight over rows STRICTLY before this row in
    * `orderCol`-ascending order. `orderCol` must be unique per row (use a
    * distinct-value table; ties would make "before" ambiguous). */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, weightCol: String,
                         nBuckets: Int = 64): DataFrame = {
    val b = df.agg(min(col(orderCol)).as("__mn"), max(col(orderCol)).as("__mx"))
    val bucketed = df.crossJoin(broadcast(b))
      .withColumn("__bkt",
        when(col("__mx") === col("__mn"), lit(0L)).otherwise(
          least(lit(nBuckets - 1L), floor(
            (col(orderCol) - col("__mn")) /
              ((col("__mx") - col("__mn")) / nBuckets)).cast("long"))))
      .drop("__mn", "__mx")
    val wLocal = Window.partitionBy("__bkt").orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__cum_local",
      coalesce(sum(col(weightCol)).over(wLocal), lit(0L)))
    val wOff = Window.orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bkt")
      .agg(sum(col(weightCol)).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select("__bkt", "__off")
    local.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("cum_before", col("__off") + col("__cum_local"))
      .drop("__bkt", "__cum_local", "__off")
  }
}
