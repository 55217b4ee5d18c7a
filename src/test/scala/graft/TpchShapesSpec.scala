package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q287-q292: the round-11 TPC-H plan-shape family (Q2, Q11, Q13, Q15,
  * Q16, Q18) — each decorrelation verified on a hand-computed planted
  * fixture that exercises the edge its shape is known for (argmin
  * tie-break, zero bucket, kept ties, NOT-IN exclusion, strict HAVING).
  */
class TpchShapesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tpch").toString

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q287: argmin per part breaks unit-price ties by lowest suppkey") {
    val dir = tmpDir()
    Seq((1L, "PROMO", 30), (2L, "PROMO", 10), (3L, "LARGE", 30))
      .toDF("p_partkey", "p_type", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // part 1: supp 20 and supp 10 both hit unit price 2.00 -> tie, keep 10;
    // supp 30's 1.99 on part 2 must not count (size 10 fails the filter);
    // part 3 fails the type filter entirely
    Seq(
      (1L, 20L, 2.0, 4.0), (1L, 10L, 1.0, 2.0), (1L, 10L, 1.0, 3.0),
      (2L, 30L, 1.0, 1.99), (3L, 40L, 1.0, 0.5))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "S10"), (20L, "S20"), (30L, "S30"), (40L, "S40"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val r = Queries.queries("q287_tpch_q2")(spark, dir)
      .as[(Long, Long, String, Double)].collect().toSet
    assert(r == Set((1L, 10L, "S10", 2.0)))
  }

  test("q288: integer share compare is strict at the boundary") {
    val dir = tmpDir()
    // total 2000.00 -> threshold rev*2000 > 200000 cents: part 1 at
    // exactly 1/2000 of total (1.00) is OUT (strict), part 2 is in
    Seq((1L, 1.00), (2L, 1999.00))
      .toDF("l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q288_tpch_q11")(spark, dir)
      .as[(Long, Double)].collect().toSet
    assert(r == Set((2L, 1999.00)))
  }

  test("q289: order-less customers land in the zero bucket") {
    val dir = tmpDir()
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c1: one urgent (filtered in the JOIN condition -> still zero bucket),
    // c2: two countable orders, c3: no orders at all
    Seq((100L, 1L, "1-URGENT"), (101L, 2L, "5-LOW"), (102L, 2L, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q289_tpch_q13")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 2L, 2L -> 1L))
  }

  test("q290: every supplier tied at the max revenue is kept") {
    val dir = tmpDir()
    Seq(
      (10L, 100.0, 0.0, ts("1996-02-01")),
      (20L, 50.0, 0.0, ts("1996-02-01")), (20L, 50.0, 0.0, ts("1996-03-01")),
      (30L, 999.0, 0.0, ts("1995-12-31")), // outside the window
      (40L, 99.0, 0.0, ts("1996-02-01")))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "S10"), (20L, "S20"), (30L, "S30"), (40L, "S40"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val r = Queries.queries("q290_tpch_q15")(spark, dir)
      .as[(Long, String, Double)].collect().toSet
    assert(r == Set((10L, "S10", 100.0), (20L, "S20", 100.0)))
  }

  test("q291: blacklisted suppliers are excluded before the distinct count") {
    val dir = tmpDir()
    Seq((1L, "STANDARD", "B1", 4), (2L, "PROMO", "B1", 4),
        (3L, "STANDARD", "B2", 9))
      .toDF("p_partkey", "p_type", "p_brand", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((10L, 5.0), (20L, -1.0), (30L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // part 1 (B1): supps 10, 20(bad), 10 again; part 2 is PROMO (out);
    // part 3 (B2): supp 30 only
    Seq((1L, 10L), (1L, 20L), (1L, 10L), (2L, 10L), (3L, 30L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q291_tpch_q16")(spark, dir)
      .as[(String, Int, Long)].collect().toSet
    assert(r == Set(("B1", 4, 1L), ("B2", 9, 1L)))
  }

  test("q292: the HAVING threshold is strict and sums span line items") {
    val dir = tmpDir()
    Seq((100L, 1L, 600.0, ts("1997-01-01")), (101L, 2L, 100.0, ts("1997-02-01")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "C1"), (2L, "C2")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // order 100: 150+101 = 251 > 250 qualifies; order 101: exactly 250 out
    Seq((100L, 150.0), (100L, 101.0), (101L, 250.0))
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q292_tpch_q18")(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(r.length == 1)
    val row = r.head
    assert(row._1 == "C1" && row._3 == 100L && row._6 == 251.0)
  }
}
