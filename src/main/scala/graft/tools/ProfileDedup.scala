package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the canonicalizeExact pipeline stages (local
  * iteration only — not part of the query surface). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val doc = graft.Tables.documents(spark, sfDir)
    // warm-up full query twice
    time("warmup q70 (full)") { noop(graft.Queries.queries("q70_canonicalize_exact")(spark, sfDir)) }
    time("q70 full (steady)") { noop(graft.Queries.queries("q70_canonicalize_exact")(spark, sfDir)) }

    import graft.text.Text
    time("scan+tokenize+shingle") {
      noop(doc.select(col("doc_id"),
        array_sort(array_distinct(Text.shingleHashes(Text.tokens(col("text")), 2))).as("s")))
    }
    val pairs = graft.dedup.Dedup.ngramJaccardSelfPairs(doc, "text", "doc_id", 2, 0.5)
    time("selfPairs (1st)") { noop(pairs) }
    val pairs2 = graft.dedup.Dedup.ngramJaccardSelfPairs(doc, "text", "doc_id", 2, 0.5)
    time("selfPairs (2nd)") { noop(pairs2) }
    val p3 = graft.dedup.Dedup.ngramJaccardSelfPairs(doc, "text", "doc_id", 2, 0.5)
      .select(col("id_a"), col("id_b"))
    time("components") {
      val (labels, _) = graft.graph.ConnectedComponents.minLabel(
        p3, doc.select(col("doc_id").as("node")), 16)
      noop(labels)
    }
    spark.stop()
  }
}
