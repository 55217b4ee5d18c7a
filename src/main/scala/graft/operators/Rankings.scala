package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / top-k / mode operators (SURVEY.md §2.5, W1-W2, A7).
  *
  * All ranking is expressed as a window over an explicit deterministic
  * ordering — ties must be broken by a total order so results are stable
  * across engines, partitionings, and scale (SURVEY.md §7 hard-part 5).
  */
object Rankings {

  /** W1 — top-k rows per group by explicit order. Single shuffle on the
    * group keys; rank pruning happens before any downstream join, so the
    * post-filter cardinality is |groups| × k regardless of input size. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= k)
      .drop("__graft_rank")
  }

  /** A7 — mode (most frequent value) of `valueCol` per group, ties broken by
    * value ascending (ref `R_groupe4.R:194-198`:
    * `group_by %>% summarise(n()) %>% arrange(desc(count)) %>% slice(1)`;
    * R tie-breaks by prior row order — we substitute a total order on the
    * value, documented deviation per SURVEY.md §7-5).
    *
    * Two-phase: pre-aggregate counts (map-side partial agg shrinks the
    * shuffle to |distinct (key, value)| rows), then rank within key. The
    * window input is already tiny, so this scales to arbitrary row counts.
    */
  def modePerGroup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val counts = df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counts.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
      .withColumnRenamed(valueCol, s"${valueCol}_mode")
  }
}
