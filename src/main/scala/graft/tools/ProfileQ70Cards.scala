package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler: intermediate CARDINALITIES of the q70 PPJoin pipeline
  * (postings, prefix rows, candidate rows, distinct pairs, verified pairs)
  * at a given SF dir — the numbers that decide whether the prefix-filter
  * stack is actually bounding candidate volume at scale.
  * Usage: runMain graft.tools.ProfileQ70Cards <sfDir> [k] [t]
  */
object ProfileQ70Cards {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(2)
    val t = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Text

    val eps = lit(1e-9)
    val doc = graft.Tables.documents(spark, sfDir)
    val sets = doc.select(col("doc_id").as("__id"),
        array_sort(array_distinct(Text.shingleHashes(Text.tokens(col("text")), k)))
          .as("__set"))
      .filter(size(col("__set")) > 0)
      .withColumn("__sz", size(col("__set")))
      .localCheckpoint()
    println(s"CARD docs            ${sets.count()}")
    val postings = sets.select(col("__id"), col("__sz"), explode(col("__set")).as("sh"))
    println(s"CARD postings        ${postings.count()}")
    val docFreq = postings.groupBy("sh").agg(count(lit(1)).as("__df"))
    println(s"CARD distinct_shingle ${docFreq.count()}")
    println("TOP  doc_freq        " + docFreq.orderBy(col("__df").desc).limit(5)
      .collect().map(r => r.getLong(1)).mkString(","))
    val probeLen = col("__sz") - ceil(col("__sz") * t - eps).cast("int") + 1
    val indexLen = col("__sz") -
      ceil(col("__sz") * (2 * t / (1 + t)) - eps).cast("int") + 1
    val ranked = postings.join(docFreq, "sh")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("sh"))))
      .filter(col("__rn") <= probeLen)
      .withColumn("__idx", col("__rn") <= indexLen)
      .select(col("__id"), col("__sz"), col("sh"), col("__rn"), col("__idx"))
      .localCheckpoint()
    println(s"CARD probe_rows      ${ranked.count()}")
    println(s"CARD index_rows      ${ranked.filter(col("__idx")).count()}")
    val probe = ranked
      .select(col("__id").as("ia"), col("__sz").as("sa"), col("sh"), col("__rn").as("ra"))
    val index = ranked.filter(col("__idx"))
      .select(col("__id").as("ib"), col("__sz").as("sb"), col("sh"), col("__rn").as("rb"))
    val alphaPair = ceil((col("sa") + col("sb")) * (t / (1 + t)) - eps)
    val joined = probe.join(index, Seq("sh"))
    println(s"CARD join_rows_raw   ${joined.count()}")
    val candidates = joined
      .filter(col("sb") < col("sa") || (col("sb") === col("sa") && col("ib") < col("ia")))
      .filter(col("sb") >= ceil(col("sa") * t - eps))
      .filter(least(col("sa") - col("ra"), col("sb") - col("rb")) + 1 >= alphaPair)
      .select(col("ia"), col("ib"), col("sa"), col("sb"))
    println(s"CARD candidates      ${candidates.count()}")
    val pairs = candidates.groupBy("ia", "ib").count()
    println(s"CARD distinct_pairs  ${pairs.count()}")
    // survivors: the verified edge list the CC stage iterates over — if
    // this is a large fraction of distinct_pairs, the spill lives in the
    // CC rounds, not the verify join
    val survivors = graft.dedup.Dedup.ngramJaccardSelfPairs(
      doc, "text", "doc_id", k, t)
    println(s"CARD survivors       ${survivors.count()}")
    spark.stop()
  }
}
