package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q251-q255 and q285-q286: the TPC-H Q17/Q21/Q20/Q22 plan shapes, the
  * referential-integrity audit, the encoding scan, and the
  * padding-efficiency audit — each on a hand-computed planted fixture. */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_audit").toString

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q285: dominance is strict, windowed, and type-scoped") {
    val dir = tmpDir()
    Seq((1L, "SMALL"), (2L, "LARGE"), (3L, "SMALL"))
      .toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(
      // part 1: supp 10 ships 60 of 100 in-window -> dominant
      (1L, 10L, 60.0, ts("1996-06-01")),
      (1L, 20L, 40.0, ts("1996-07-01")),
      // out-of-window monster line must not count toward the total
      (1L, 20L, 1000.0, ts("1995-06-01")),
      // part 2 is LARGE: its sole supplier must not qualify
      (2L, 30L, 100.0, ts("1996-06-01")),
      // part 3: exactly half each -> strict > keeps both out
      (3L, 40L, 50.0, ts("1996-06-01")),
      (3L, 50L, 50.0, ts("1996-06-01")))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "S10"), (20L, "S20"), (30L, "S30"), (40L, "S40"), (50L, "S50"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val r = Queries.queries("q285_tpch_q20")(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(r == Set((10L, "S10")))
  }

  test("q296: Brier decomposition is hand-exact and the Murphy identity holds") {
    val dir = tmpDir()
    // keys 0,1,2,100 -> pc = 0,19,38,0; y = 1,0,1,0
    Seq((0L, "F"), (1L, "O"), (2L, "F"), (100L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q296_brier_decomposition")(spark, dir)
      .as[(Double, Double, Double, Double)].head()
    // bins: {0: n2 sp0 sy1 sq10000} {1: n1 sp19 sy0 sq361} {3: n1 sp38 sy1 sq3844}
    assert(r == ((0.355125, 0.230125, 0.125, 0.25)))
    // forecasts are constant within each bin here, so BS = REL - RES + UNC exactly
    assert(math.abs(r._1 - (r._2 - r._3 + r._4)) < 1e-12)
  }

  test("q297: a homogeneous quasi-identifier group is flagged, a diverse one is not") {
    val dir = tmpDir()
    Seq(
      (1L, "1-URGENT", ts("1996-03-01"), "F"),
      (2L, "1-URGENT", ts("1996-07-01"), "F"),
      (3L, "5-LOW", ts("1996-03-01"), "F"),
      (4L, "5-LOW", ts("1996-07-01"), "O"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q297_l_diversity")(spark, dir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(r == Set(("1-URGENT", 1996L, 2L, 1L, false),
                    ("5-LOW", 1996L, 2L, 2L, true)))
  }

  test("q298: paths cut at 3 events, split on strict >30min gaps only") {
    val dir = tmpDir()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      // user 1: 4-event session (path capped at A>B>C), then a 45-min gap
      (1L, 10L, "A", t("2024-01-01 10:00:00")),
      (1L, 11L, "B", t("2024-01-01 10:05:00")),
      (1L, 12L, "C", t("2024-01-01 10:10:00")),
      (1L, 13L, "D", t("2024-01-01 10:15:00")),
      (1L, 14L, "A", t("2024-01-01 11:00:00")),
      // user 2: exactly 1800 s gap -> SAME session (strict >)
      (2L, 20L, "X", t("2024-01-01 12:00:00")),
      (2L, 21L, "Y", t("2024-01-01 12:30:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q298_top_paths")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(r == Map("A>B>C" -> 1L, "A" -> 1L, "X>Y" -> 1L))
  }

  test("q299: hand-computed quintile boundaries, recency inverted") {
    val dir = tmpDir()
    // customer k: k orders of $10 on one date; rec = [40,30,20,10,0] days
    // from the corpus max date -> freq/mon/rec quintiles all align to k
    val dates = Seq("2024-01-01", "2024-01-11", "2024-01-21",
      "2024-01-31", "2024-02-10")
    val rows = for {
      k <- 1 to 5
      j <- 1 to k
    } yield (k * 100L + j, k.toLong, ts(dates(k - 1)), 10.0)
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q299_rfm_segments")(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(r == (1 to 5).map(k => (s"$k-$k-$k", 1L, k * 10.0)).toSet)
  }

  test("q300: first-decile occurrences are novel, repeats later are stale") {
    val dir = tmpDir()
    val docs = Seq(
      (0L, "a b a b"),  // "a b" x2 + "b a": all first here -> 3/3
      (1L, "a b c")     // "a b" stale, "b c" novel -> 1/2
    ) ++ (2L to 9L).map(k => (k, s"w$k w$k")) // one novel bigram each
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q300_ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    val expect = Set((1L, 3L, 3L, 1.0), (2L, 2L, 1L, 0.5)) ++
      (3L to 10L).map(dc => (dc, 1L, 1L, 1.0))
    assert(r == expect)
  }

  test("q293: disjoint range layout scores 1.0, interleaved layout saturates") {
    val dir = tmpDir()
    // orderkeys 0..31, shipdates strictly increasing with orderkey:
    // 'clustered' ranges are disjoint by construction (avg overlap 1.0),
    // 'roundrobin' (orderkey % 16) gives every file the full date span
    (0 until 32).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(1996, 1, 1, 0, 0).plusDays(i))))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q293_clustering_depth")(spark, dir)
      .as[(String, Long, Double, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("clustered")._3 == 1.0, s"clustered: ${r("clustered")}")
    assert(r("natural") == (("natural", 1L, 1.0, 1L)))   // all keys DIV 1000 = 0
    assert(r("roundrobin") == (("roundrobin", 16L, 16.0, 16L)))
  }

  test("q294: histogram estimate is exact when buckets isolate keys") {
    val dir = tmpDir()
    // key 0 x3, key 1 x1 -> exact 3^2+1^2 = 10; global 4^2/2 = 8;
    // hist16 puts each key alone in its bucket -> 9 + 1 = 10 exactly
    Seq(0L, 0L, 0L, 1L).toDF("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.queries("q294_join_card_estimate")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(r == Set(("global", 8L, 10L, -0.2), ("hist16", 10L, 10L, 0.0)))
  }

  test("q286: scalar threshold is strict, anti-join excludes recent orderers") {
    val dir = tmpDir()
    // positive balances 100, 200, 300 -> avg 200 (c3's -50 excluded)
    Seq((1L, 1, 100.0), (2L, 1, 200.0), (3L, 2, -50.0), (4L, 2, 300.0),
        (5L, 3, 250.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (100L, 4L, ts("1998-06-01")),  // old order: c4 still qualifies
      (101L, 5L, ts("1999-06-01"))) // recent order: c5 anti-joined away
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q286_tpch_q22")(spark, dir)
      .as[(Int, Long, Double)].collect().toSet
    // c2 sits exactly AT the average -> strict > keeps it out
    assert(r == Set((2, 1L, 300.0)))
  }

  test("q251: only lines under 20% of their part's average quantity count") {
    val dir = tmpDir()
    // part 100, Brand#1: quantities 1..10 -> avg 5.5, lim 1.1 -> only the
    // qty-1 line (price 12.34) qualifies; part 200 is the wrong brand.
    (1 to 10).map(q => (100L, q.toDouble, 12.34))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
      .union(Seq((200L, 1.0, 99.99)).toDF("l_partkey", "l_quantity", "l_extendedprice"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((100L, "Brand#1"), (200L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Queries.queries("q251_small_qty_revenue")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "Brand#1")
    assert(r(0).getLong(1) == 1L)       // n_small
    assert(r(0).getLong(2) == 1234L)    // revenue_cents
  }

  test("q252: sole late supplier on a multi-supplier order, and only that") {
    val dir = tmpDir()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(days: Int) = new java.sql.Timestamp(
      base.getTime + days * 86400000L)
    // order 1: suppliers 10 (late) + 11 (on time) -> 10 waits alone: counts
    // order 2: supplier 10 late but single-supplier: excluded
    // order 3: suppliers 10 + 11 both late: excluded (n_late = 2)
    Seq(
      (1L, 10L, plus(50)), (1L, 11L, plus(10)),
      (2L, 10L, plus(60)),
      (3L, 10L, plus(50)), (3L, 11L, plus(50)))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, base), (2L, base), (3L, base))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "Sup#10"), (11L, "Sup#11"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val r = Queries.queries("q252_sole_late_supplier")(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("s_suppkey") == 10L)
    assert(row.getAs[Long]("numwait") == 1L)
    assert(row.getAs[String]("s_name") == "Sup#10")
  }

  test("q253: planted orphans and duplicate keys are counted exactly") {
    val dir = tmpDir()
    // lineitem: one orphan orderkey (99), one orphan partkey (98), one
    // orphan suppkey (97); orders has a DUPLICATED pk (1,1).
    Seq((1L, 100L, 10L), (99L, 100L, 10L), (1L, 98L, 10L), (1L, 100L, 97L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5L), (1L, 5L), (2L, 6L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((5L, 1), (6L, 1)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((100L, "x")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((10L, 1)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1, 1)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq(Tuple1(1)).toDF("r_regionkey")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val r = Queries.queries("q253_referential_audit")(spark, dir)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("fk_lineitem_orders") == (1L, 4L))   // orderkey 99
    assert(r("fk_lineitem_part") == (1L, 4L))     // partkey 98
    assert(r("fk_lineitem_supplier") == (1L, 4L)) // suppkey 97
    assert(r("fk_orders_customer") == (0L, 3L))
    assert(r("pk_orders") == (1L, 2L))            // key 1 duplicated
    assert(r("pk_customer") == (0L, 2L))
    assert(r("fk_nation_region") == (0L, 1L))
    assert(r.size == 12)
  }

  test("q254: planted damage classes are found, clean docs stay clean") {
    val dir = TestSpark.sf0001
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val expect = docs.groupBy(col("doc_id") % 7).count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r = Queries.queries("q254_mojibake_scan")(spark, dir)
    val tot = r.agg(sum("n_docs"), sum("n_mojibake"), sum("n_replacement"),
      sum("n_control"), sum("n_nbsp")).head()
    assert(tot.getLong(0) == expect.values.sum)
    // classes 0 and 1 both plant mojibake; 2/3/4 plant one artifact each
    assert(tot.getLong(1) == expect(0L) + expect(1L))
    assert(tot.getLong(2) == expect(2L))
    assert(tot.getLong(3) == expect(3L))
    assert(tot.getLong(4) == expect(4L))
    val rates = r.select("clean_rate").as[Double].collect()
    assert(rates.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("q263: groups under k are flagged with their exact row counts") {
    val dir = tmpDir()
    // QI = (nation, segment, balance band): band is cents DIV 100000 on a
    // +1e8 offset. Group A (nation 1, seg "X", band of 500.00) has 3
    // rows; group B (nation 2, seg "Y", band of -100.00) has 1 row.
    Seq((1, "X", 500.00), (1, "X", 500.10), (1, "X", 599.99),
        (2, "Y", -100.00))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = Queries.queries("q263_k_anonymity")(spark, dir)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // k=2: group B (size 1) below -> 1 group, 1 row at risk
    assert(r(2L) == (2L, 1L, 1L))
    // k=5: both groups below -> 2 groups, all 4 rows at risk
    assert(r(5L) == (2L, 2L, 4L))
    assert(r(10L) == (2L, 2L, 4L))
  }

  test("q255: sorted batching never pads more than hashed on this fixture") {
    val dir = tmpDir()
    // 20 docs, lengths 1..20 (doc i has i tokens), one source.
    (1 to 20).map(i => (i.toLong, "s0", Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q255_padding_efficiency")(spark, dir)
      .collect().map(x => x.getString(1) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // sorted desc: batch0 = lengths 20..5 (max 20, n 16), batch1 = 4..1
    // (max 4, n 4) -> padded = 320 + 16 = 336; tokens = 210
    assert(r("sorted") == (2L, 210L, 336L))
    val (hb, ht, hp) = r("hashed")
    assert(hb == 2L && ht == 210L)
    assert(hp >= 336L, "sorted is the padding lower bound on this fixture")
  }

  test("q311: a group's missing bucket contributes its full global mass") {
    val dir = tmpDir()
    // one day (epoch day 4 -> dow 4); buckets: <125 -> 0, 125-250 -> 1.
    // A: {b0:1, b1:1} n=2; B: {b0:3} n=3; global: {b0:4, b1:1} N=5.
    // TVD(A) = (|1*5-4*2| + |1*5-1*2|) / (2*2*5) = (3+3)/20 = 0.3
    // TVD(B) = (|3*5-4*3| + |0*5-1*3|) / (2*3*5) = (3+3)/30 = 0.2
    //   -- B never sees bucket 1: the grid row supplies the |0 - p1| term.
    val day = ts("1970-01-05")
    Seq(("A", day, 10.0), ("A", day, 130.0),
        ("B", day, 10.0), ("B", day, 10.0), ("B", day, 10.0))
      .toDF("event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q311_t_closeness")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(r == Set(("A", 4L, 2L, 0.3), ("B", 4L, 3L, 0.2)))
  }

  test("q313: independent raters give kappa 0; unanimous raters give NULL") {
    val dir = tmpDir()
    // a = n_chars > 300, b = alpha ratio > 0.85:
    // n=4, na=2, nb=2, nab=1 -> p_o = 0.5, p_e = 0.5, kappa = 0
    Seq((1L, "AAAA", 400L), (2L, "1234", 400L),
        (3L, "AAAA", 100L), (4L, "1111", 100L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.queries("q313_cohens_kappa")(spark, dir)
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(r.toSeq == Seq((4L, 0.5, 0.5, Some(0.0))))
    // unanimous: p_e = 1 -> the kappa guard yields NULL, not a crash
    val dir2 = tmpDir()
    Seq((1L, "AAAA", 400L), (2L, "BBBB", 400L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r2 = Queries.queries("q313_cohens_kappa")(spark, dir2)
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(r2.toSeq == Seq((2L, 1.0, 1.0, None)))
  }

  test("q314: RANGE frame pools same-day peers and honors the 90-day edge") {
    val dir = tmpDir()
    Seq(
      (1L, 7L, ts("1995-01-01"), 10.0), // day 0
      (2L, 7L, ts("1995-03-31"), 20.0), // day 89: day 0 still in frame
      (3L, 7L, ts("1995-04-01"), 5.0),  // day 90: day 0 ages out...
      (4L, 7L, ts("1995-04-01"), 7.0))  // ...and BOTH day-90 rows pool
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.queries("q314_trailing_spend")(spark, dir)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(r == Set(
      (1L, 7L, 0L, 10.0, 1L), (2L, 7L, 89L, 30.0, 2L),
      (3L, 7L, 90L, 32.0, 3L), (4L, 7L, 90L, 32.0, 3L)))
  }
}
