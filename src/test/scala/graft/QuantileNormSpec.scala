package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: quantile normalization, cluster size profile,
  * streaming bounded-histogram p95 (q221-q223). */
class QuantileNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantile normalization: one row per doc, monotone within source") {
    val out = Queries.queries("q221_quantile_normalize")(spark, TestSpark.sf0001)
    val docs = Tables.documents(spark, TestSpark.sf0001)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // Within a source, a higher raw score must never map to a lower
    // normalized score (rank mapping is monotone by construction).
    val viol = out.as("a").join(out.as("b"),
        col("a.source") === col("b.source") &&
          col("a.n_chars") < col("b.n_chars") &&
          col("a.norm_chars") > col("b.norm_chars"))
      .count()
    assert(viol == 0)
    // Normalized values are drawn from the global value set.
    val unknown = out.join(docs.select(col("n_chars").as("norm_chars")).distinct(),
      Seq("norm_chars"), "left_anti").count()
    assert(unknown == 0)
  }

  test("cluster size profile partitions the corpus") {
    val out = Queries.queries("q222_cluster_size_profile")(spark, TestSpark.sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (size, nClusters, nDocs) =>
      assert(nDocs == size * nClusters, s"size $size row inconsistent")
    }
    val total = out.map(_._3).sum
    assert(total == Tables.documents(spark, TestSpark.sf0001).count())
    assert(out.exists(_._1 > 1), "corpus has near-dup clusters above size 1")
  }

  test("streaming p95 equals the batch histogram replay and covers >= 95%") {
    val got = Queries.queries("q223_stream_quantile")(spark, TestSpark.sf0001)
      .select("win_start", "event_type", "n_events", "p95_bin")
      .as[(Long, String, Long, Long)].collect().toSet
    // Batch replay with identical integer arithmetic.
    val hist = Tables.events(spark, TestSpark.sf0001)
      .select(unix_timestamp(window(col("ts"), "1 hour").getField("start"))
          .as("win_start"),
        col("event_type"), floor(col("value")).cast("long").as("bin"))
      .groupBy("win_start", "event_type", "bin").agg(count(lit(1)).as("c"))
    val per = org.apache.spark.sql.expressions.Window
      .partitionBy("win_start", "event_type")
    val batch = hist
      .withColumn("cum", sum(col("c")).over(per.orderBy("bin")))
      .withColumn("n_events", sum(col("c")).over(per))
      .filter(col("cum") >= ceil(col("n_events") * lit(0.95)).cast("long"))
      .groupBy("win_start", "event_type", "n_events")
      .agg(min(col("bin")).as("p95_bin"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // Coverage: at least 95% of each key's events fall at or below p95_bin.
    val cov = hist.withColumn("n", sum(col("c")).over(per))
      .join(Queries.queries("q223_stream_quantile")(spark, TestSpark.sf0001)
        .select(col("win_start"), col("event_type"), col("p95_bin")),
        Seq("win_start", "event_type"))
      .groupBy("win_start", "event_type", "n", "p95_bin")
      .agg(sum(when(col("bin") <= col("p95_bin"), col("c"))
        .otherwise(0L)).as("below"))
      .filter(col("below") * 100 < col("n") * 95)
      .count()
    assert(cov == 0)
  }
}
