package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for q182 stages (local iteration only). */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
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

    import graft.text.Text
    val doc = graft.Tables.documents(spark, sfDir)
    val k = 5
    val base = doc.select(col("doc_id").as("__id"),
      Text.tokenCount(col("text")).as("__nt"),
      Text.ngramStrings(col("text"), k).as("__grams"))
    val grams = base.select(col("__id"), posexplode(col("__grams")))
      .select(col("__id"), (col("pos") + 1).cast("long").as("__pos"),
        col("col").as("__gram"))
    time("warm grams") { noop(grams) }
    time("grams") { noop(grams) }
    val dup = grams.select(col("__gram"), col("__id")).distinct()
      .groupBy("__gram").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2).select("__gram")
    time("dup grams") { noop(dup) }
    val joined = grams.join(dup, "__gram")
    time("join grams x dup") { noop(joined) }
    println("joined rows: " + joined.count())
    val islands = joined
      .withColumn("__island", col("__pos") - row_number().over(
        Window.partitionBy("__id").orderBy("__pos")))
      .groupBy(col("__id"), col("__island"))
      .agg(count(lit(1)).as("__ilen"))
    time("islands") { noop(islands) }
    val full = graft.dedup.RepeatedSpans.perDoc(doc, "text", "doc_id", 5, 2)
    time("full perDoc") { noop(full) }
    time("full perDoc again") { noop(full) }
    spark.stop()
  }
}
