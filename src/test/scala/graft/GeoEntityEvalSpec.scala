package graft

import org.scalatest.funsuite.AnyFunSuite

/** q343–q346: haversine site assignment, survivorship golden record,
  * multi-class F1, gains/lift curve — fixtures with hand-checkable
  * outcomes (points planted on city coordinates, a 3-record entity with
  * an acctbal tie, a 4-event confusion, a 20-score two-decile target).
  */
class GeoEntityEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def t(k: Int): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(k.toLong))

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q343: planted points snap to their city; rings follow the replay") {
    val dir = tmpDir("graft_hav")
    // (uid, cents) -> lat = 43 + (uid%1000)*0.006, lon = -1 + (cents%600)*0.01
    writeEvents(dir, Seq(
      (1L, t(0), 976L, "view", 3.35), // (48.856, 2.35)  ~ Paris
      (2L, t(1), 306L, "view", 0.42), // (44.836, -0.58) ~ Bordeaux
      (3L, t(2), 0L, "view", 0.0)))   // (43.0, -1.0)    far south-west
    val got = Queries.queries("q343_haversine_sites")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // replay the same formula driver-side
    val sites = Seq((1L, 48.8566, 2.3522), (2L, 45.764, 4.8357),
      (3L, 43.2965, 5.3698), (4L, 50.6292, 3.0573), (5L, 44.8378, -0.5792))
    def hav(lat: Double, lon: Double)(s: (Double, Double)): Double = {
      val sh = math.sin(math.toRadians(s._1 - lat) / 2)
      val sl = math.sin(math.toRadians(s._2 - lon) / 2)
      val d = 2.0 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(
        sh * sh + math.cos(math.toRadians(lat)) *
          math.cos(math.toRadians(s._1)) * (sl * sl))))
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = Seq((48.856, 2.35), (44.836, -0.58), (43.0, -1.0)).map {
      case (la, lo) =>
        val (sid, dk) = sites.map(s => (s._1, hav(la, lo)((s._2, s._3))))
          .minBy { case (id, dd) => (dd, id) }
        (sid, math.floor(dk / 100).toLong)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSet
    assert(got == want)
    assert(got.map(_._1) == Set(1L, 5L), "Paris and Bordeaux win")
  }

  test("q344: acctbal tie keeps the lower custkey; segment mode is alphabetical on ties") {
    val dir = tmpDir("graft_gold")
    Seq(
      (1L, "Alice", 1, 10.50, "AUTO"),
      (2L, "Bob", 1, 99.99, "BUILDING"),
      (3L, "Cara", 1, 99.99, "BUILDING"),
      (10L, "Dan", 2, 5.00, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = Queries.queries("q344_golden_record")(spark, dir)
      .as[(Long, Long, Long, String, String, Double)].collect()
      .sortBy(_._1).toSeq
    assert(r == Seq(
      (0L, 1L, 3L, "Bob", "BUILDING", 210.48),
      (1L, 10L, 1L, "Dan", "MACHINERY", 5.00)))
  }

  test("q345: hand confusion gives per-class F1 and micro 0.75 / macro 0.6") {
    val dir = tmpDir("graft_f1")
    writeEvents(dir, Seq(
      (1L, t(0), 1L, "view", 0.5), (2L, t(1), 1L, "view", 0.5),
      (3L, t(2), 1L, "click", 0.5),        // predicted view -> miss
      (4L, t(3), 1L, "purchase", 250.0)))  // predicted purchase -> hit
    val r = Queries.queries("q345_multiclass_f1")(spark, dir)
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Double,
        Double, Double)].collect().sortBy(_._1).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val macroF1 = r6((0.8 + 0.0 + 1.0) / 3.0)
    assert(r == Seq(
      ("click", 0L, 0L, 1L, None, Some(0.0), 0.0, 0.75, macroF1),
      ("purchase", 1L, 0L, 0L, Some(1.0), Some(1.0), 1.0, 0.75, macroF1),
      ("view", 2L, 1L, 0L, Some(r6(2.0 / 3.0)), Some(1.0), 0.8, 0.75,
        macroF1)))
  }

  test("q346: top-two-decile positives gain 0.5 then 1.0 at lift 5") {
    val dir = tmpDir("graft_gains")
    val rows = (1 to 20).map { i =>
      (i.toLong, t(i), 1L,
        if (i >= 17) "purchase" else "view", i * 0.01)
    }
    writeEvents(dir, rows)
    val r = Queries.queries("q346_gains_curve")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == (1L to 10L))
    assert(r.forall(_._2 == 2L), "exact deciles of 2")
    assert(r.map(_._3) == Seq(2L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(r.map(_._4) == Seq(0.5, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    assert(r.map(_._5) == Seq(5.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }
}
