package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q37's logistic fit time + confusion stability vs maxIter.
  * Usage: runMain graft.tools.TuneQ37 <sfDir> */
object TuneQ37 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val li = graft.Tables.lineitem(spark, d)
      .withColumn("is_high_disc", (col("l_discount") > 0.05).cast("double"))
    li.count() // warm the scan
    for (it <- Seq(5, 10, 15, 20, 25)) {
      val t0 = System.nanoTime()
      val rows = graft.ml.Models.logisticConfusion(
        li, "is_high_disc", Seq("l_quantity", "l_discount", "l_tax"),
        Seq("l_linestatus"), maxIter = it)
        .orderBy("label", "prediction").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"maxIter=$it%3d  $secs%6.2f s  " +
        rows.map(r => s"(${r.get(0)},${r.get(1)},${r.get(2)})").mkString(" "))
    }
    spark.stop()
  }
}
