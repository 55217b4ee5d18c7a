package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q70 stage timing — candidate generation vs verification vs
  * component propagation. Usage: runMain graft.tools.TuneQ70 <sfDir> */
object TuneQ70 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val doc = graft.Tables.documents(spark, d)
    doc.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // steady state: run twice, report second
    (1 to 2).foreach { round =>
      println(s"--- pass $round")
      val pairs = time("pairs") {
        val p = graft.dedup.Dedup.ngramJaccardSelfPairs(doc, "text", "doc_id",
          k = 2, threshold = 0.5)
        println("  n_pairs=" + p.count()); p
      }
      time("full") {
        println("  rows=" + graft.dedup.Dedup.canonicalizeExact(
          doc, "text", "doc_id", k = 2, jaccardThreshold = 0.5).count())
      }
    }
    spark.stop()
  }
}
