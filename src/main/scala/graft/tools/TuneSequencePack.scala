package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Locate the super-linear CPU the sf100 audit found in q84
  * (packOffsets: 38.8× cpu at 10× rows while every sibling stayed ≤10×).
  * Measures, on one SF dir: (a) a pure tokenCount scan (the linear
  * baseline), (b) packOffsets at a sweep of nBuckets — if per-bucket
  * row count drives the blow-up, wider sweeps flatten it and the fix is
  * sizing nBuckets to the data, not the constant 32.
  * Usage: runMain graft.tools.TuneSequencePack <sfDir> [nBuckets,...]
  */
object TuneSequencePack {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sweeps = args.lift(1).getOrElse("32,128,512,2048")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // mirror ScalingAudit's session (adaptive, obj-agg threshold,
    // ExtraConf passthrough): a probe diagnosing an audit anomaly must
    // measure the same plan environment the audit ran in
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "1048576"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new ScalingAudit.MetricsListener
    spark.sparkContext.addSparkListener(l)

    val docs = graft.Tables.documents(spark, sfDir)
    def measure(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm-up evaluation first (the measureDf contract): codegen JIT and
      // page-cache warming must not confound the sweep trend — without
      // this, a monotonically-increasing sweep reads partly as run order
      mk.write.mode("overwrite").format("noop").save()
      val (m, wall) = ScalingAudit.measureDf(spark, l, mk)
      println(f"[tune-seqpack] $tag%-18s wall ${wall}%7.2fs cpu ${m("cpu_ms") / 1e3}%8.1fs " +
        f"shuffle ${m("shuffle_write_bytes") / 1e6}%9.1fM spill ${m("mem_spill_bytes") / 1e6}%7.0fM")
    }

    measure("tokenCount-scan") {
      docs.select(graft.text.Text.tokenCount(col("text")).as("n"))
        .agg(sum(col("n")))
    }
    for (n <- sweeps) measure(s"packOffsets n=$n") {
      graft.text.SequencePack.packOffsets(
        docs, "doc_id", graft.text.Text.tokenCount(col("text")),
        budget = 2048L, nBuckets = n)
    }
    spark.stop()
  }
}
