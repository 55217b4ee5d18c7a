package graft

import graft.functions.BloomFilterAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime Bloom pre-filter (q149): build/probe parity, merge
  * behavior, false-positive bound, and end-to-end transparency. */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 64  // 4096 bits
  private val K = 3

  private def bloomOf(keys: Seq[Long], parts: Int = 1) = {
    val df = spark.createDataset(keys).toDF("k").repartition(parts)
    df.agg(BloomFilterAgg(col("k"), W, K).as("bloom"))
  }

  test("no false negatives: every inserted key probes true, any partitioning") {
    val keys = (1L to 500L).map(i => i * 7919L % 100003L)
    for (parts <- Seq(1, 8)) {
      val hits = spark.createDataset(keys).toDF("k")
        .crossJoin(broadcast(bloomOf(keys, parts)))
        .filter(BloomFilterAgg.mightContain(col("k"), col("bloom"), W, K))
        .count()
      assert(hits == keys.length, s"missed ${keys.length - hits} keys at $parts partitions")
    }
  }

  test("merge is a bitwise OR: split build equals single-partition build") {
    val keys = (1L to 300L)
    val one = bloomOf(keys, 1).as[Array[Long]].first()
    val many = bloomOf(keys, 16).as[Array[Long]].first()
    assert(one.sameElements(many))
  }

  test("false-positive rate stays near the analytic bound") {
    val keys = (1L to 200L)
    val b = bloomOf(keys)
    // probe 10k keys far outside the inserted range
    val probes = spark.range(1000000L, 1010000L).toDF("k")
    val fp = probes.crossJoin(broadcast(b))
      .filter(BloomFilterAgg.mightContain(col("k"), col("bloom"), W, K))
      .count()
    // (1 - e^(-kn/m))^k with n=200, m=4096, k=3 → ~2.4e-3; allow 4x slack
    assert(fp < 100, s"$fp false positives out of 10000 — bloom is degenerate")
  }

  test("q149 equals the plain exact semi-join (bloom is transparent)") {
    val got = Queries.queries("q149_bloom_join")(spark, TestSpark.sf0001)
      .select("l_suppkey", "cnt", "revenue")
      .as[(Long, Long, Double)].collect().toSet
    val dim = Tables.supplier(spark, TestSpark.sf0001)
      .filter(col("s_nationkey") < 5).select(col("s_suppkey"))
    val want = Tables.lineitem(spark, TestSpark.sf0001)
      .join(dim, col("l_suppkey") === col("s_suppkey"), "leftsemi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice")), 4).as("revenue"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }
}
