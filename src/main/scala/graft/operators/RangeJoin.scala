package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: pair each fact row with the dimension rows whose
  * [lo, hi) interval contains the fact's point value.
  *
  * Spark plans a raw `point >= lo && point < hi` join as a broadcast
  * nested loop — O(|facts|·|ranges|) comparisons. [[binned]] keeps the
  * same semantics but materializes each range into the fixed-width bins it
  * overlaps and equi-joins on the bin id, so each fact row meets only the
  * ranges sharing its bin: a hash join that scales with the fact side.
  * Each (fact, range) pair can match at most once (the fact lives in
  * exactly one bin), so no dedup is needed. Bin width should be on the
  * order of the median range width.
  */
object RangeJoin {
  /** Baseline θ-join form (correct at any size; nested-loop cost). */
  def naive(facts: DataFrame, ranges: DataFrame, pointCol: String,
            loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(ranges),
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))

  /** Binned equi-join form — identical output, hash-join cost. */
  def binned(facts: DataFrame, ranges: DataFrame, pointCol: String,
             loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    // hi is exclusive: a range ending exactly on a bin edge must not
    // replicate into that bin — when hi divides binWidth exactly, its bin
    // is one below floor(hi/binWidth). (An epsilon subtraction can't do
    // this: denormal offsets underflow and fixed offsets break for large
    // magnitudes.) The post-join refilter keeps output exact either way;
    // this only avoids the wasted replica row.
    val hiBin = (floor(col(hiCol) / binWidth) -
      when(col(hiCol) % binWidth === 0.0, 1).otherwise(0)).cast("long")
    // greatest(): an empty range (lo == hi on a bin edge) would otherwise
    // make sequence() count DOWN and fabricate bins.
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val rBinned = ranges.withColumn("__bin",
      explode(sequence(loBin, greatest(hiBin, loBin))))
    val fBinned = facts.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    fBinned.join(broadcast(rBinned), Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
