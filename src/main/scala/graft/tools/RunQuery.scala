package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump ONE named query (and its oracle SQL, if any) so a
  * single entry can be iterated on locally without running the full
  * [[graft.Verify]] sweep. Usage: runMain graft.tools.RunQuery <name> <sfDir> <outDir>
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Queries.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.Queries.oracle.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.oracle.sql"), sql)
    }
    spark.stop()
  }
}
