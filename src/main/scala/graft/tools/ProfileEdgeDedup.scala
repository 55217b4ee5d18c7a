package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bound the documented map-side-combine trade of [[graft.graph.EdgeLayout
  * .partitionedDistinct]]'s window dedup (PageRank.scala's construction
  * note): the window form keeps ONE full-edge exchange but shuffles every
  * duplicate row (no partial aggregation), where the old
  * distinct-then-repartition form combined duplicates map-side at the cost
  * of a SECOND full-edge exchange. The engine's callers build near-distinct
  * edges, so r16 shipped the window form on shape arguments alone — this
  * probe measures the pessimal case it accepts: K adjacent duplicates of
  * every pair (explode puts all K in the source partition, so the old
  * form's partial agg collapses them pre-shuffle — the maximum possible
  * map-side win, i.e. the upper bound of the window form's regression).
  *
  * Usage: runMain graft.tools.ProfileEdgeDedup <out.json> [nPairs] [dupK]
  * Emits per-variant shuffle bytes + wall for duplicate rates 1 and dupK.
  */
object ProfileEdgeDedup {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nPairs = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val dupK = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = ExtraConf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new ScalingAudit.MetricsListener
    spark.sparkContext.addSparkListener(l)

    // near-distinct synthetic pairs (~nPairs of them), then K adjacent
    // copies of every pair — duplicates co-located in their source
    // partition, the map-side-combine best case for the agg form
    def edges(k: Int) = spark.range(nPairs)
      .select(pmod(col("id"), lit(1000000L)).as("src"),
        pmod(col("id") * lit(2654435761L), lit(1000000L)).as("dst"))
      .select(col("src"), col("dst"),
        explode(array((0 until k).map(lit): _*)).as("__k"))
      .drop("__k")

    def windowForm(k: Int) =
      graft.graph.EdgeLayout.partitionedDistinct(edges(k), "src", "dst")
    // the pre-r16 two-exchange form: partial-agg distinct (map-side
    // combine) THEN the layout repartition + sort
    def aggForm(k: Int) = edges(k).distinct()
      .repartition(col("src")).sortWithinPartitions("src", "dst")

    val variants = Seq(
      ("window_k1", () => windowForm(1)), ("agg_k1", () => aggForm(1)),
      (s"window_k$dupK", () => windowForm(dupK)),
      (s"agg_k$dupK", () => aggForm(dupK)))
    // one warm-up each (codegen), then one measured pass each
    variants.foreach { case (_, f) =>
      f().write.mode("overwrite").format("noop").save()
    }
    val rows = variants.map { case (name, f) =>
      val (m, wall) = ScalingAudit.measureDf(spark, l, f())
      val cols = (m.toSeq.sortBy(_._1).map { case (kk, v) => s""""$kk":$v""" } :+
        f""""wall_sec":$wall%.4f""").mkString("{", ",", "}")
      println(s"[edgededup] $name $cols")
      s""""$name":$cols"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString(s"""{"n_pairs":$nPairs,"dup_k":$dupK,""", ",", "}\n"))
    spark.stop()
  }
}
