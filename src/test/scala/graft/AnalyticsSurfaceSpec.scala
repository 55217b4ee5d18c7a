package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzzy matching, analytic rank functions, unpivot, resampling
  * (q129-q132). */
class AnalyticsSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouping sets emits exactly the two marginals, flags disambiguate") {
    val out = Queries.queries("q143_grouping_sets")(spark, TestSpark.sf0001)
      .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "cnt")
      .as[(Option[String], Option[String], Long, Long, Long)].collect()
    // every row is exactly one of the two single-column marginals
    out.foreach { case (f, st, gf, gs, _) =>
      assert((gf, gs) == (0L, 1L) || (gf, gs) == (1L, 0L))
      assert((gf == 0L) == f.isDefined, "flag marginal keeps l_returnflag")
      assert((gs == 0L) == st.isDefined, "status marginal keeps l_linestatus")
    }
    // each marginal's counts equal the plain groupBy counts
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val byFlag = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val byStatus = li.groupBy("l_linestatus").count()
      .as[(String, Long)].collect().toMap
    assert(out.filter(_._3 == 0L).map(r => r._1.get -> r._5).toMap == byFlag)
    assert(out.filter(_._4 == 0L).map(r => r._2.get -> r._5).toMap == byStatus)
  }

  test("ewma: constant series is constant, first event equals its value") {
    val out = Queries.queries("q144_ewma")(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "ewma").as[(Long, Long, Double)].collect()
    assert(out.length == Tables.events(spark, TestSpark.sf0001).count())
    // the per-user FIRST event's frame is [value] alone, so ewma == value
    val firstIds = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .groupBy(_._1).map { case (_, rows) =>
        val f = rows.minBy(r => (r._2.getTime, r._3)); f._3 -> f._4 }
    val byId = out.map(r => r._1 -> r._3).toMap
    firstIds.foreach { case (id, v) =>
      assert(math.abs(byId(id) - v) < 5e-5, s"first event $id ewma != value") }
    // constant-series fixture: ewma of 7,7,7 is exactly 7 at every step
    val fix = Seq((1L, 1L, 7.0), (1L, 2L, 7.0), (1L, 3L, 7.0))
      .toDF("user_id", "event_id", "value")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, 0, 0, event_id)"))
    fix.createOrReplaceTempView("__ewma_fix")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-15, 0)
    val e = fix.withColumn("__frame", collect_list(col("value")).over(w))
      .withColumn("ewma", expr(
        """aggregate(zip_with(__frame, transform(__frame, (x, i) ->
          |  power(0.75D, CAST(size(__frame) - 1 - i AS DOUBLE))),
          |  (x, w) -> x * w), 0D, (a, t) -> a + t) /
          |aggregate(transform(__frame, (x, i) ->
          |  power(0.75D, CAST(size(__frame) - 1 - i AS DOUBLE))),
          |  0D, (a, t) -> a + t)""".stripMargin))
      .select("ewma").as[Double].collect()
    assert(e.forall(v => math.abs(v - 7.0) < 1e-12))
  }

  test("LOCF: gaps carry the previous observation, non-gaps keep their value") {
    val out = Queries.queries("q151_locf")(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "was_gap", "value_filled")
      .as[(Long, Long, Long, Option[Double])].collect()
    // driver-side replay: same md5 gap rule, same per-user order
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "ts", "value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    def gap(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "0123".contains(f"${h(0) & 0xff}%02x".charAt(0))
    }
    val want = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(r => (r._3.getTime, r._1)).toSeq.map { r =>
        if (!gap(r._1)) carry = Some(r._4)
        r._1 -> ((gap(r._1), carry))
      }
    }
    val got = out.map(r => r._1 -> (r._3 == 1L, r._4)).toMap
    want.foreach { case (id, (g, v)) =>
      assert(got(id) == ((g, v)), s"event $id: got ${got(id)}, want ($g, $v)") }
  }

  test("rolling z-score: null under 8 prior points, matches driver replay") {
    val out = Queries.queries("q152_rolling_zscore")(spark, TestSpark.sf0001)
      .select("event_id", "n_win", "zscore")
      .as[(Long, Long, Option[Double])].collect()
    out.foreach { case (id, n, z) =>
      if (n < 8) assert(z.isEmpty, s"event $id scored with only $n prior points") }
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "ts", "value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val want = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._1)).toSeq
      ordered.zipWithIndex.map { case (r, i) =>
        val win = ordered.slice(math.max(0, i - 16), i).map(_._4)
        val n = win.length
        val z = if (n >= 8) {
          val m = win.sum / n
          val v = (win.map(x => x * x).sum - n * m * m) / (n - 1)
          if (v > 0) Some((r._4 - m) / math.sqrt(v)) else None
        } else None
        r._1 -> z
      }
    }
    val got = out.map(r => r._1 -> r._3).toMap
    want.foreach { case (id, z) =>
      (z, got(id)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 5e-4, s"event $id: $b != $a")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"event $id: $b vs $a")
      }
    }
  }

  test("entity resolution equals a driver-side union-find over the pair set") {
    val out = Queries.queries("q153_entity_resolution")(spark, TestSpark.sf0001)
      .select("name", "canonical", "cluster_size")
      .as[(String, String, Long)].collect()
    val names = Tables.part(spark, TestSpark.sf0001)
      .select("p_name").distinct().as[String].collect()
    // brute-force pairs + union-find
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- names; b <- names if a < b && lev(a, b) <= 2) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val comp = names.groupBy(find)
    val canonOf = comp.toSeq.flatMap { case (_, members) =>
      val c = members.min
      members.toSeq.map(m => m -> ((c, members.length.toLong)))
    }.toMap
    assert(out.length == names.length)
    out.foreach { case (n, c, sz) =>
      assert(canonOf(n) == ((c, sz)), s"$n: got ($c,$sz), want ${canonOf(n)}") }
  }

  test("fuzzy match resolves each misspelling to the intended nation") {
    val got = Queries.queries("q129_fuzzy_match")(spark, TestSpark.sf0001)
      .select("probe", "best_name").as[(String, String)].collect().toMap
    assert(got == Map(
      "NATIN_3" -> "NATION_3", "NATIONN_8" -> "NATION_8",
      "MATION_19" -> "NATION_19", "NATI0N_21" -> "NATION_21",
      "NATOIN_14" -> "NATION_14"))
  }

  test("analytic ranks: bounds, quartile balance, cume_dist reaches 1") {
    val out = Queries.queries("q130_analytic_ranks")(spark, TestSpark.sf0001)
      .select("o_orderpriority", "pct_rank", "cume", "quartile")
      .as[(String, Double, Double, Long)].collect()
    assert(out.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    assert(out.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    out.groupBy(_._1).foreach { case (grp, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).values.toSeq
      assert(rows.map(_._4).toSet == Set(1L, 2L, 3L, 4L), s"quartiles in $grp")
      assert(sizes.max - sizes.min <= 1, s"ntile balance in $grp: $sizes")
      assert(rows.map(_._3).max == 1.0, s"cume_dist max in $grp")
    }
  }

  test("unpivot emits measures x rows and round-trips through re-pivot") {
    val base = Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_orderkey") < 2000)
    val out = Queries.queries("q131_unpivot")(spark, TestSpark.sf0001)
    assert(out.count() == 3 * base.count())
    // re-pivot one measure and compare to the original column
    val back = out.filter(col("measure") === "l_quantity")
      .select(col("l_orderkey"), col("l_linenumber"), col("value"))
    val orig = base.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("value"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("funnel stages are monotone and bounded by the group count") {
    val out = Queries.queries("q136_funnel")(spark, TestSpark.sf0001)
      .select("n_groups", "reached_view", "reached_click", "reached_purchase")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, v, c, p) =>
      assert(n >= v && v >= c && c >= p && p >= 0,
        s"funnel not monotone: $n >= $v >= $c >= $p")
    }
    // the funnel actually discriminates on this data: some group completes
    // it and some group doesn't
    assert(out.map(_._4).sum > 0, "no group ever completes the funnel")
    assert(out.exists { case (n, _, _, p) => p < n }, "funnel never filters")
  }

  test("retention: offset-0 cell equals the cohort size; later cells shrink-or-equal") {
    val out = Queries.queries("q137_retention")(spark, TestSpark.sf0001)
      .select("cohort_wk", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2 >= 0))
    val byCohort = out.groupBy(_._1)
    byCohort.foreach { case (ck, rows) =>
      val base = rows.find(_._2 == 0)
      assert(base.isDefined, s"cohort $ck missing its offset-0 cell")
      assert(rows.forall(_._3 <= base.get._3),
        s"cohort $ck: a later cell exceeds the cohort size")
    }
    // cohort sizes sum to the distinct-user count
    val users = Tables.events(spark, TestSpark.sf0001)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == users)
  }

  test("full outer join null-extends exactly the filter-disjoint nations") {
    val out = Queries.queries("q141_full_outer")(spark, TestSpark.sf0001)
      .select("nationkey", "cust_cnt", "supp_cnt")
      .as[(Long, Option[Long], Option[Long])].collect().map(r => r._1 -> r).toMap
    // customers kept for nation >= 5, suppliers for nation < 15 (a nation
    // may simply have no suppliers at sf0.001, so only the implication
    // directions hold); a full outer row can never be null on both sides
    out.foreach { case (nk, (_, c, s)) =>
      assert(c.isEmpty || nk >= 5, s"nation $nk cust side outside filter")
      assert(s.isEmpty || nk < 15, s"nation $nk supp side outside filter")
      assert(c.isDefined || s.isDefined, s"nation $nk all-null row")
    }
    // both null-extension directions are actually exercised
    assert(out.values.exists(r => r._2.isEmpty && r._3.isDefined))
    assert(out.values.exists(r => r._2.isDefined && r._3.isEmpty))
  }

  test("fuzzy join: length-band blocking is lossless vs the unblocked join") {
    val out = Queries.queries("q142_fuzzy_join")(spark, TestSpark.sf0001)
      .select("name_a", "name_b", "dist").as[(String, String, Long)].collect()
    assert(out.forall(r => r._3 <= 2 && r._1 < r._2))
    // levenshtein >= |len difference|, so the band can't drop a real pair
    val names = Tables.part(spark, TestSpark.sf0001)
      .select("p_name").distinct().as[String].collect()
    val brute = (for {
      a <- names; b <- names if a < b
      d = {
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      } if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(out.toSet == brute)
  }

  test("resample grid is gap-free per user and preserves observed counts") {
    val out = Queries.queries("q132_resample")(spark, TestSpark.sf0001)
      .select("user_id", "hour_s", "cnt").as[(Long, Long, Long)].collect()
    val byUser = out.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val hours = rows.map(_._2).sorted
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 },
        s"user $u grid has gaps")
    }
    val observed = Tables.events(spark, TestSpark.sf0001)
      .filter(col("user_id") < 30).count()
    assert(out.map(_._3).sum == observed, "zero-fill must not invent events")
  }

  test("q316: the slope median shrugs off an outlier that wrecks the mean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    def t(h: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-01-01T00:00:00Z").plusSeconds(3600L * h))
    // perfect slope 2/hour over 8 hours, except one wild outlier at h=6.
    // systematic pairs (i, i+4): slopes (2,2,152/4? ...) — three of the
    // four pairs hit slope 2, one crosses the outlier -> median 2.0
    val rows = (0 until 8).map { h =>
      val v = if (h == 6) 600.0 else 2.0 * h
      (h.toLong, t(h), "A", v)
    }
    rows.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q316_theil_sen")(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(r.toSeq == Seq(("A", 4L, 2.0)))
  }

  test("q322: U-shaped credit splits 40/20/40 and solo clicks take 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ush").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: purchase 10:30 with clicks 09:35 / 10:00 / 10:15 (path of 3,
    // first crosses the hour-band boundary); user 2: one click -> 1.0
    Seq((1L, ts("2024-01-05 10:30:00"), 1L, "purchase", 9.0),
        (2L, ts("2024-01-05 09:35:00"), 1L, "click", 1.0),
        (3L, ts("2024-01-05 10:00:00"), 1L, "click", 1.0),
        (4L, ts("2024-01-05 10:15:00"), 1L, "click", 1.0),
        (5L, ts("2024-01-05 12:00:00"), 2L, "purchase", 9.0),
        (6L, ts("2024-01-05 11:30:00"), 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q322_position_attribution")(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((9L, 1L, 0.4), (10L, 2L, 0.6), (11L, 1L, 1.0)))
  }

  test("q323: a one-hour click->purchase echo correlates exactly at lag +1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccf").toString
    def t(h: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(3600L * h))
    val clicksPerHour = Seq(1, 2, 3, 1, 2, 3)
    val rows = clicksPerHour.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(k => (h * 100L + k, t(h), 1L, "click", 1.0)) ++
        (0 until c).map(k => (h * 100L + 50 + k, t(h + 1), 1L, "purchase", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q323_cross_correlation")(spark, dir)
      .as[(Long, Long, Option[Double])].collect().map(x => x._1 -> x).toMap
    // purchases are exactly last hour's clicks: perfect correlation, and
    // the ratio of equal exact-integer factors is bit-exact 1.0
    assert(r(1L) == ((1L, 6L, Some(1.0))))
  }

  test("q324: alternating series is anti-persistent with closed-form R/S") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hurst").toString
    def t(h: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(3600L * h))
    val alt = (0 until 128).flatMap { h =>
      (0 until (if (h % 2 == 0) 1 else 2)).map(k =>
        (h * 10L + k, t(h), 1L, "view", 1.0))
    }
    alt.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q324_hurst_exponent")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // per-block R/S is identical across blocks: R = 0.5 always (the
    // cumulative deviation sawtooths between -bn/2-scaled and 0), and
    // S^2 = (q - s^2/bn)/(bn-1) with exact integer moments
    val expected = Seq(8L -> 0.935414, 16L -> 0.968246,
      32L -> 0.984251, 64L -> 0.992157)
    assert(r.map(x => x._1 -> x._3).toSeq == expected)
    assert(r.map(_._2).toSeq == Seq(16L, 8L, 4L, 2L))
    val h = r.head._4
    assert(r.forall(_._4 == h) && h < 0.1, s"alternating series hurst $h")

    // monotonic trend: cumulative deviations grow with the block, H -> 1
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hurst2").toString
    val trend = (0 until 128).flatMap { h =>
      (0 to h).map(k => (h * 1000L + k, t(h), 1L, "view", 1.0))
    }
    trend.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val h2 = Queries.queries("q324_hurst_exponent")(spark, dir2)
      .select("hurst").as[Double].head()
    assert(h2 > 0.85, s"trending series hurst $h2")
  }

  test("q317: a pure linear trend decomposes to an all-zero seasonal profile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sd").toString
    def t(h: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(3600L * h))
    // y = h cents: the centered 25-hour MA reproduces y exactly, so every
    // hour-of-day seasonal is 0; hours 0-11 and 38-49 lack a full window
    val rows = (0 until 50).map(h => (h.toLong, t(h), "A", h / 100.0))
    rows.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q317_seasonal_decompose")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(r.length == 24 && r.forall(_._4 == 0.0))
    // full-window hours are 12..37 -> hods 12..23 and 0..11, one or two obs
    assert(r.map(_._3).sum == 26L)
  }
}
