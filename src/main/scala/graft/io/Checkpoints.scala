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

  /** [[truncate]] (eager), additionally GUARANTEEING that `df`'s output
    * partitioning and ordering survive into the checkpoint's LogicalRDD.
    * Under AQE the executed plan is an AdaptiveSparkPlanExec, which
    * reports UnknownPartitioning at the point Dataset.checkpoint captures
    * layout — so a checkpoint built with AQE on silently loses its
    * `repartition(...).sortWithinPartitions(...)` contract and every
    * downstream consumer re-exchanges AND re-sorts it (measured: the
    * entire sf100 graph-family spill band, 262-339 GB per query, was
    * iterations re-sorting "pre-partitioned" edge checkpoints). The
    * two value-identical strategies:
    *
    *   - Local mode (no [[ConfKey]]): columnar `persist(MEMORY_AND_DISK)`
    *     + count. InMemoryRelation exposes the cached plan's partitioning
    *     and ordering even under AQE (Spark ships
    *     `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false`
    *     precisely so cached layouts stay reusable), and the columnar
    *     cache is COMPRESSED — measured ~10× smaller than the
    *     row-oriented localCheckpoint blocks on a 1.2B-row long-pair edge
    *     table, which is the difference between fitting executor memory
    *     and spilling the decade. Lineage is not cut, but every caller
    *     here unrolls a FIXED small iteration count, so plan depth is
    *     bounded by construction.
    *   - Reliable mode ([[ConfKey]] set): Dataset.checkpoint with AQE
    *     momentarily disabled for the materialization (restored in a
    *     finally) — AdaptiveSparkPlanExec reports UnknownPartitioning at
    *     the point Dataset.checkpoint captures layout, so an AQE-on
    *     checkpoint silently loses its layout contract and every consumer
    *     re-exchanges AND re-sorts (measured: the entire sf100
    *     graph-family spill band, 262-339 GB per query, was iterations
    *     re-sorting "pre-partitioned" edge checkpoints). AQE stays on for
    *     every consuming query.
    *
    * Use this for checkpoints whose LAYOUT downstream plans reuse (the
    * iterative graph operators); plain [[truncate]] is right when the
    * checkpoint is only a lineage cut. */
  def truncateLayoutPreserving(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(ConfKey).exists(_.nonEmpty)) {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      try truncate(df, eager = true)
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    } else {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
  }

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
