package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage metrics for ONE query — the drill-down companion to
  * [[ScalingAudit]]'s per-query totals: when a query's cpu/shuffle moves
  * between rounds, this localizes WHICH stage grew. Prints one line per
  * completed stage (id, task count, cpu, shuffle r/w, input, spill,
  * first line of the call site) across the query's whole execution,
  * including the eager checkpoint-materialization jobs that explain()
  * cannot see.
  *
  * Usage: runMain graft.tools.ProfileStages <sfDir> <queryName>
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val spark = ExtraConf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"cpu_s=${m.executorCpuTime / 1e9}%9.1f " +
          f"shufR_mb=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1f " +
          f"shufW_mb=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1f " +
          f"in_mb=${m.inputMetrics.bytesRead / 1e6}%9.1f " +
          f"spill_mb=${m.memoryBytesSpilled / 1e6}%9.1f " +
          s"| ${i.name.linesIterator.next()}")
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    println(f"[total] wall_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
