package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q287-q292 + q301-q309: the TPC-H plan-shape family (Q2, Q5-Q16, Q18,
  * Q19) — each decorrelation verified on a hand-computed planted fixture
  * that exercises the edge its shape is known for (argmin tie-break, zero
  * bucket, kept ties, NOT-IN exclusion, strict HAVING, the Q5 nation
  * cycle, Q19's residual disjunction).
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

  /** Shared star fixture for the q301+ family: 2 regions, 3 nations,
    * 2 customers, 2 suppliers. Writers only emit the columns the queries
    * under test actually select (parquet pruning makes the rest moot). */
  private def starDir(): String = {
    val dir = tmpDir()
    Seq((0, "ASIA"), (1, "AMERICA")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    // N0, N1 in ASIA; N2 in AMERICA
    Seq((0, "NATION_1", 0), (1, "NATION_2", 0), (2, "NATION_3", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "C1", 10.0, 0), (2L, "C2", 20.0, 2))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, "S10", 0), (20L, "S20", 1), (30L, "S30", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    dir
  }

  test("q301: the c_nationkey = s_nationkey cycle excludes cross-nation lines") {
    val dir = starDir()
    Seq((100L, 1L, ts("1996-06-01")), (101L, 1L, ts("1995-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 100 (cust N0/ASIA): supp 10 is N0 -> local, counts; supp 20 is
    // N1 -> cross-nation, OUT even though both nations are ASIA; order 101
    // is outside the date band entirely
    Seq((100L, 10L, 100.0, 0.0), (100L, 20L, 999.0, 0.0),
        (101L, 10L, 50.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q301_tpch_q5")(spark, dir)
      .as[(String, Double)].collect().toSet
    assert(r == Set(("NATION_1", 100.0)))
  }

  test("q302: every band boundary is honored (0.07 in, qty 24 out)") {
    val dir = tmpDir()
    Seq(
      (ts("1996-06-01"), 0.07, 10.0, 100.0), // in: revenue 7.00
      (ts("1996-06-01"), 0.08, 10.0, 100.0), // discount above band
      (ts("1996-06-01"), 0.05, 24.0, 100.0), // qty not < 24
      (ts("1997-01-01"), 0.06, 10.0, 100.0)) // past the date band
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q302_tpch_q6")(spark, dir)
      .as[(Double, Long)].collect()
    assert(r.toSeq == Seq((7.0, 1L)))
  }

  test("q303: both shipping directions group separately; same-nation is out") {
    // Own fixture (not starDir): the committed query filters the
    // NATION_3/NATION_8 pair, so the nation table must carry those names.
    val dir = tmpDir()
    Seq((0, "NATION_3"), (1, "NATION_8"), (2, "NATION_5"))
      .toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // cust 1 is NATION_3, cust 2 is NATION_5 (not in the pair).
    Seq((1L, 0), (2L, 2)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // supp 10 is NATION_3, supp 20 is NATION_8.
    Seq((10L, 0), (20L, 1)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((100L, 1L), (101L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // supp 20 (NATION_8) -> cust 1 (NATION_3): direction N8->N3, in;
    // supp 10 (NATION_3) -> cust 1 (NATION_3): same nation, out;
    // supp 10 -> cust 2: customer outside the pair, out.
    Seq((100L, 20L, ts("1996-03-01"), 200.0, 0.0),
        (100L, 10L, ts("1996-03-01"), 999.0, 0.0),
        (101L, 10L, ts("1997-03-01"), 999.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q303_tpch_q7")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSet
    assert(r == Set(("NATION_8", "NATION_3", 1996L, 200.0)))
  }

  test("q304: a year with no NATION_3 supplier volume shares 0.0") {
    val dir = starDir()
    Seq((1L, "ECONOMY"), (2L, "LARGE")).toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // customer 2 is NATION_3 -> AMERICA (the import region).
    Seq((100L, 2L, ts("1996-06-01")), (101L, 2L, ts("1997-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // 1996: supp 30 (NATION_3) 60.00 of 100.00 -> share 0.6;
    // 1997: only supp 10 (NATION_1) -> share 0.0; LARGE part never counts
    Seq((100L, 1L, 30L, 60.0, 0.0), (100L, 1L, 10L, 40.0, 0.0),
        (100L, 2L, 30L, 999.0, 0.0), (101L, 1L, 10L, 50.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q304_tpch_q8")(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(r == Map(1996L -> 0.6, 1997L -> 0.0))
  }

  test("q305: profit nets cost per row and the LIKE filter gates parts") {
    val dir = starDir()
    Seq((1L, "red widget", 100.0), (2L, "blue bolt", 1.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((100L, ts("1996-06-01"))).toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // widget line: revenue 50.00, cost = 100.0 * 5 * 2 = 1000 cents ->
    // profit 40.00; the bolt line is filtered by the LIKE
    Seq((100L, 1L, 10L, 5.0, 50.0, 0.0), (100L, 2L, 10L, 5.0, 99.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q305_tpch_q9")(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(r == Set(("NATION_1", 1996L, 40.0)))
  }

  test("q306: only R-flagged lines in the quarter bill to the customer") {
    val dir = starDir()
    Seq((100L, 1L, ts("1996-02-01")), (101L, 1L, ts("1996-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 100 in the quarter: R line 30.00 counts, N line doesn't;
    // order 101's R line is outside the quarter
    Seq((100L, "R", 30.0, 0.0), (100L, "N", 999.0, 0.0),
        (101L, "R", 999.0, 0.0))
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q306_tpch_q10")(spark, dir)
      .as[(Long, String, Double, Double, String)].collect().toSet
    assert(r == Set((1L, "C1", 30.0, 10.0, "NATION_1")))
  }

  test("q307: the 60-day lateness bound is strict and priorities split") {
    val dir = tmpDir()
    Seq((100L, ts("1996-01-01"), "1-URGENT"),
        (101L, ts("1996-01-01"), "5-LOW"),
        (102L, ts("1996-01-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // 100: shipped day 61 -> late, high bucket; 101: day 61 -> late, low
    // bucket; 102: exactly day 60 -> NOT late (strict >)
    Seq((100L, ts("1996-03-02"), "O"), (101L, ts("1996-03-02"), "O"),
        (102L, ts("1996-03-01"), "O"))
      .toDF("l_orderkey", "l_shipdate", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q307_tpch_q12")(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(("O", 1L, 1L)))
  }

  test("q308: the promo share is a percentage of one month's revenue") {
    val dir = tmpDir()
    Seq((1L, "PROMO"), (2L, "LARGE")).toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, ts("1996-09-15"), 25.0, 0.0), (2L, ts("1996-09-15"), 75.0, 0.0),
        (1L, ts("1996-10-01"), 999.0, 0.0)) // next month, out
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q308_tpch_q14")(spark, dir)
      .as[Double].collect()
    assert(r.toSeq == Seq(25.0))
  }

  test("q309: rows passing one branch's brand and another's quantity are out") {
    val dir = tmpDir()
    Seq((1L, "Brand#12", 3), (2L, "Brand#23", 8), (3L, "Brand#12", 7))
      .toDF("p_partkey", "p_brand", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(
      (1L, 5.0, 10.0, 0.0),   // Brand#12 size 3 qty 5 -> branch 1, in
      (1L, 25.0, 999.0, 0.0), // Brand#12 but qty in branch 3's range -> out
      (2L, 15.0, 20.0, 0.0),  // Brand#23 size 8 qty 15 -> branch 2, in
      (3L, 5.0, 999.0, 0.0))  // Brand#12 size 7 fails branch 1's size cap
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q309_tpch_q19")(spark, dir)
      .as[(Double, Long)].collect()
    assert(r.toSeq == Seq((30.0, 2L)))
  }
}
