package graft

import graft.operators.{Impute, Rankings}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImputeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("firstNonNullFill uses the group's earliest non-null (A9)") {
    val df = Seq(
      ("g1", 1L, None: Option[String]), ("g1", 2L, Some("a")), ("g1", 3L, Some("b")),
      ("g2", 1L, None: Option[String])).toDF("g", "id", "v")
    val out = Impute.firstNonNullFill(df, Seq("g"), "v", "id")
      .orderBy("g", "id").select("v").as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("a"), Some("a"), Some("b"), None))
  }

  test("firstInclNullFill preserves the A10 quirk (first row null → fill null)") {
    val df = Seq(
      ("g1", 1L, None: Option[String]), ("g1", 2L, Some("a"))).toDF("g", "id", "v")
    val out = Impute.firstInclNullFill(df, Seq("g"), "v", "id")
      .orderBy("id").select("v").as[Option[String]].collect()
    // min_by(v, id) picks id=1's null → the null row stays null
    assert(out.toSeq == Seq(None, Some("a")))
  }

  test("firstFills == chained firstNonNullFill + firstInclNullFill, one agg pass") {
    // the fused multi-column form must be value-identical to the two
    // single-column operators run back-to-back (the q66 pipeline shape:
    // two fills over the same group key)
    val df = Seq(
      ("g1", 1L, None: Option[String], None: Option[String]),
      ("g1", 2L, Some("a"), Some("x")),
      ("g1", 3L, Some("b"), None: Option[String]),
      ("g2", 1L, None: Option[String], Some("y")),
      ("g2", 2L, Some("c"), None: Option[String]),
      ("g3", 1L, None: Option[String], None: Option[String]))
      .toDF("g", "id", "p", "s")
    val chained = Impute.firstInclNullFill(
      Impute.firstNonNullFill(df, Seq("g"), "p", "id"), Seq("g"), "s", "id")
      .orderBy("g", "id").collect().toSeq
    val fused = Impute.firstFills(df, Seq("g"), Seq("p" -> false, "s" -> true), "id")
      .orderBy("g", "id").collect().toSeq
    assert(fused == chained)
    // and the fused plan really has a single aggregation over df
    val nAggs = Impute.firstFills(df, Seq("g"), Seq("p" -> false, "s" -> true), "id")
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    assert(nAggs == 1, s"expected one aggregation, got $nAggs")
  }

  test("modePerGroup breaks count ties by value ascending") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("g", "v")
    val out = Rankings.modePerGroup(df, Seq("g"), "v")
      .select("v_mode", "cnt").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L)))
  }

  test("modeFill fills nulls with the group mode, leaves non-null alone") {
    val df = Seq(
      ("g1", Some("x")), ("g1", Some("x")), ("g1", Some("y")), ("g1", None),
      ("g2", None)).toDF("g", "v")
    val out = Impute.modeFill(df, Seq("g"), "v")
      .groupBy("g").agg(sum(when(col("v").isNull, 1).otherwise(0)).as("nulls"))
      .as[(String, Long)].collect().toMap
    assert(out("g1") == 0) // filled with "x"
    assert(out("g2") == 1) // no mode available → stays null
  }

  test("knnImputeExact picks the geometric nearest; ties by tieBreak id") {
    val missing = Seq((100L, 0.0, 0.0)).toDF("id", "x", "y")
    val known = Seq(
      (1L, 3.0, 0.0, "far"), (2L, 1.0, 0.0, "near"),
      (3L, 0.0, 1.0, "near_tie")). // same distance as id=2 → id=2 wins
      toDF("kid", "x", "y", "label")
    val out = Impute.knnImputeExact(missing, known, "x", "y", "id", "kid", Seq("label"))
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((100L, "near")))
  }

  test("knnImputeGrid matches knnImputeExact on random points (exactness)") {
    val rng = new scala.util.Random(7)
    val known = (1 to 300).map(i =>
      (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 100, s"v$i"))
      .toDF("kid", "x", "y", "label")
    val missing = (1 to 40).map(i =>
      (1000L + i, rng.nextDouble() * 100, rng.nextDouble() * 100))
      .toDF("id", "x", "y")
    val exact = Impute.knnImputeExact(missing, known, "x", "y", "id", "kid", Seq("label"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    val grid = Impute.knnImputeGrid(missing, known, "x", "y", "id", "kid", Seq("label"),
      cellSize = 10.0)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(grid == exact)
  }

  test("knnImputeGrid == knnImputeExact on the real events table") {
    val e = Tables.events(spark, TestSpark.sf0001)
    val missing = e.filter(col("event_id") % 100 === 0)
    val known = e.filter(col("event_id") % 100 =!= 0)
    val exact = Impute.knnImputeExact(missing, known, "user_id", "value",
        "event_id", "event_id", Seq("event_type"))
      .orderBy("event_id").as[(Long, String)].collect().toSeq
    val grid = Impute.knnImputeGrid(missing, known, "user_id", "value",
        "event_id", "event_id", Seq("event_type"), cellSize = 25.0)
      .orderBy("event_id").as[(Long, String)].collect().toSeq
    assert(exact.nonEmpty && grid == exact)
  }

  test("knnImpute auto-switches on the broadcast threshold and stays value-identical") {
    val rng = new scala.util.Random(11)
    val known = (1 to 200).map(i =>
      (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 100, s"v$i"))
      .toDF("kid", "x", "y", "label")
    val missing = (1 to 30).map(i =>
      (1000L + i, rng.nextDouble() * 100, rng.nextDouble() * 100))
      .toDF("id", "x", "y")
    // default threshold (10MB): tiny local relation → exact path
    assert(Impute.fitsBroadcast(missing))
    val exact = Impute.knnImpute(missing, known, "x", "y", "id", "kid", Seq("label"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    // threshold of 1 byte: nothing fits → grid path with the auto cell
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      assert(!Impute.fitsBroadcast(missing), "switch must trigger at threshold 1")
      val grid = Impute.knnImpute(missing, known, "x", "y", "id", "kid", Seq("label"))
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(grid == exact)
    } finally spark.conf.set(key, saved)
  }

  test("autoCellSize targets ~1 known point per cell; degenerate extents get 1.0") {
    val rng = new scala.util.Random(3)
    val known = (1 to 400).map(i =>
      (i.toLong, rng.nextDouble() * 100, rng.nextDouble() * 100)).toDF("kid", "x", "y")
    val c = Impute.autoCellSize(known, "x", "y")
    // area ~100x100 over 400 points → cell ~5; extent is random so allow slack
    assert(c > 3.0 && c < 7.0, s"cell $c")
    val point = Seq((1L, 42.0, 42.0)).toDF("kid", "x", "y")
    assert(Impute.autoCellSize(point, "x", "y") == 1.0)
    assert(Impute.autoCellSize(point.filter(col("kid") > 1), "x", "y") == 1.0)
  }

  test("knnImputeGrid resolves isolated points via ring escalation/fallback") {
    val known = Seq((1L, 0.0, 0.0, "origin")).toDF("kid", "x", "y", "label")
    val missing = Seq((10L, 500.0, 500.0)).toDF("id", "x", "y") // 50 cells away
    val out = Impute.knnImputeGrid(missing, known, "x", "y", "id", "kid",
      Seq("label"), cellSize = 10.0, maxRounds = 3)
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((10L, "origin")))
  }
}
