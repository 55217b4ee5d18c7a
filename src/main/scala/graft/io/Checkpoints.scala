package graft.io

import org.apache.spark.sql.DataFrame

/** The reliable-checkpoint seam for every iterative operator that truncates
  * lineage per round ([[graft.dedup.Dedup]] min-label propagation,
  * [[graft.operators.Impute.knnImputeGrid]] ring escalation, the shared
  * subtrees of `ngramJaccardSelfPairs`).
  *
  * `localCheckpoint` stores blocks on executors only: correct and fast in
  * local mode and on a healthy cluster, but an executor loss mid-iteration
  * kills the job instead of recomputing. Setting
  * `spark.graft.checkpointDir=<fault-tolerant path>` (HDFS/S3 on a real
  * cluster) flips every consumer to reliable `checkpoint()`, which survives
  * executor loss at the cost of a write to the shared filesystem per round.
  * Unset → `localCheckpoint`, the local-mode default.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s lineage: reliable `checkpoint` when
    * [[ConfKey]] is set (the Spark checkpoint dir is initialized from the
    * conf value on first use), `localCheckpoint` otherwise. */
  def truncate(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // idempotent: only (re)set when absent or pointed elsewhere, so two
        // operators in one session agree on the directory
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
  }
}
