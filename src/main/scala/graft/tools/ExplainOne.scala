package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of the named queries (no execution):
  * `sbt "runMain graft.tools.ExplainOne q231_attribution q32_minhash_lsh"`.
  * Same session config as Verify/Bench (GraftExtensions registered).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val plan = Queries.queries(name)(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====\n$plan")
    }
    spark.stop()
  }
}
