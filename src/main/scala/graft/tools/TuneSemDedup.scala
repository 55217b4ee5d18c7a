package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment for the SemDedup k-sizing rule (see the scaladoc on
  * [[graft.dedup.SemDedup.semDedup]]): within-cell pair work is n²/k, so
  * at a fixed corpus each doubling of k should roughly halve the
  * quadratic part's wall (until Lloyd's O(n·k) assignment or the k-limited
  * join parallelism takes over). Runs the q108 shape (dup-injected
  * embeddings, threshold 0.99, 2 Lloyd iters) at each k in the argument
  * list and prints walls.
  * Usage: runMain graft.tools.TuneSemDedup <sfDir> <k1,k2,...>
  */
object TuneSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("8,64").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
    // injected ids must sit strictly above the corpus's real id range —
    // a fixed +100000 offset collides once the corpus has >100k vectors
    // (sf1/sf10), producing duplicate keys that skew the measurement
    val idBase = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    val dups = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + idBase).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.05)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = e.unionByName(dups)

    for (k <- ks; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.dedup.SemDedup.semDedup(corpus, "vec_id", "embedding",
          k = k, trainIters = 2, threshold = 0.99)
        .write.mode("overwrite").format("noop").save()
      println(f"[tune-semdedup] k=$k%-5d pass=$pass wall=${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
