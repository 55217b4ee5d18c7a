package graft

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summarize(items: Seq[Long], k: Int, parts: Int): Seq[(Long, Long, Long)] =
    items.toDF("x").repartition(parts)
      .agg(SpaceSavingTopK(col("x"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.count", "e.error")
      .as[(Long, Long, Long)].collect().toSeq

  test("unsaturated sketch is exact (k >= distinct items)") {
    val items = Seq.fill(30)(1L) ++ Seq.fill(20)(2L) ++ Seq.fill(10)(3L)
    val got = summarize(scala.util.Random.shuffle(items), k = 8, parts = 3)
    assert(got == Seq((1L, 30L, 0L), (2L, 20L, 0L), (3L, 10L, 0L)))
  }

  test("saturated sketch keeps every item with freq > n/k; bounds hold (single partition)") {
    // 1000 items: item 1 x400, item 2 x300, tail 300 distinct singletons
    val items = Seq.fill(400)(1L) ++ Seq.fill(300)(2L) ++ (100L until 400L)
    val rng = new scala.util.Random(5)
    val shuffled = rng.shuffle(items)
    val k = 4
    val got = summarize(shuffled, k, parts = 1)
    val true1 = 400L; val true2 = 300L; val n = items.size
    assert(got.size <= k)
    // superset guarantee: freq > n/k = 250 → items 1 and 2 must be present
    val byItem = got.map(e => e._1 -> e).toMap
    assert(byItem.contains(1L) && byItem.contains(2L))
    // count bounds: true <= count <= true + error
    val (_, c1, e1) = byItem(1L)
    val (_, c2, e2) = byItem(2L)
    assert(c1 >= true1 && c1 <= true1 + e1)
    assert(c2 >= true2 && c2 <= true2 + e2)
    assert(n == 1000)
  }

  test("merged (multi-partition) sketch preserves the superset guarantee") {
    val rng = new scala.util.Random(11)
    // heavy: 3 items at ~15% each; tail: 550 singleton-ish items
    val items = rng.shuffle(
      Seq.fill(150)(7L) ++ Seq.fill(150)(8L) ++ Seq.fill(150)(9L) ++
        (1000L until 1550L))
    val k = 16 // n/k = 1000/16 = 62.5 < 150
    for (parts <- Seq(2, 8, 32)) {
      val got = summarize(items, k, parts)
      val present = got.map(_._1).toSet
      assert(Set(7L, 8L, 9L).subsetOf(present), s"parts=$parts: $present")
      assert(got.size <= k)
      // bounds survive the merge
      got.filter(e => Set(7L, 8L, 9L).contains(e._1)).foreach { case (i, c, err) =>
        assert(c >= 150L && c <= 150L + err, s"parts=$parts item $i: ($c, $err)")
      }
    }
  }

  test("two-phase sketch+recount equals exact heavy hitters on real events") {
    val e = Tables.events(spark, TestSpark.sf0001)
    val n = e.count()
    val k = 16 // n/k = 62.5 at sf0.001; several users exceed it
    val cand = e.agg(SpaceSavingTopK(col("user_id"), k).as("s"))
      .select(explode(col("s")).as("c")).select(col("c.item").as("user_id"))
    val recount = e.join(broadcast(cand), "user_id")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n)) // freq > n/k
      .as[(Long, Long)].collect().toSet
    val exact = e.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))
      .as[(Long, Long)].collect().toSet
    assert(recount == exact && exact.nonEmpty)
  }

  test("sketch runs in ObjectHashAggregate with map-side partial aggregation") {
    val df = Tables.events(spark, TestSpark.sf0001)
      .agg(SpaceSavingTopK(col("user_id"), 16))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_space_saving_topk"), plan)
  }
}
