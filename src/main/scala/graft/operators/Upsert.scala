package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style snapshot maintenance over immutable columnar storage — the
  * logical core of what table formats (Delta/Iceberg/Hudi-class) call
  * upsert/merge, expressed as pure relational algebra so it runs on any
  * Spark + parquet layout:
  *
  *   next = (snapshot ⟕̸ changes.keys)            -- untouched rows
  *        ∪ (changes WHERE op ≠ 'delete')        -- upserted rows
  *
  * i.e. a change row REPLACES the snapshot row with its key (update), adds
  * it (insert), or removes it (delete) — last-writer-wins per key, and the
  * changeset is required to carry at most one row per key (enforce
  * upstream with q03's keyed dedup if the log has multiple revisions).
  *
  * Scale shape: one shuffle of each side on the key (the anti-join), plus
  * a by-name union — no window, no driver state. At 100 TB the physical
  * form is copy-on-write over PRUNED partitions/file groups: partition the
  * snapshot on a key prefix, semi-join the changeset's touched partitions,
  * and rewrite only those — the relational semantics here are unchanged,
  * which is why the operator is defined logically. With a sorted/bucketed
  * layout (io/Bucketing) the anti-join is shuffle-free. */
object Upsert {

  /** Apply `changes` (same schema as `snapshot` + an `op` column in
    * {insert, update, delete}) to `snapshot` by `key`. */
  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
            opCol: String = "op"): DataFrame = {
    val cols = snapshot.columns.toSeq
    val untouched = snapshot.join(
      changes.select(col(key)).distinct(), Seq(key), "left_anti")
    val upserts = changes.filter(col(opCol) =!= "delete")
      .select(cols.map(col): _*)
    untouched.select(cols.map(col): _*).unionByName(upserts)
  }
}
