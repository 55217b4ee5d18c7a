package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeBlanks: blank/whitespace-only → null, content preserved") {
    val df = Seq(("", "x"), ("  ", "y"), ("a ", "z"), (null, "w")).toDF("c", "k")
    val out = Cleaning.normalizeBlanks(df, Seq("c")).select("c").as[Option[String]].collect()
    assert(out.toSeq == Seq(None, None, Some("a "), None))
  }

  test("normalizeBlanks defaults to all string columns") {
    val df = Seq((" ", " ", 1)).toDF("a", "b", "n")
    val r = Cleaning.normalizeBlanks(df).first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 1)
  }

  test("dedupKeepFirst keeps the row ranked first by the explicit order") {
    val df = Seq((1, 10, "late"), (1, 5, "first"), (2, 7, "only")).toDF("k", "ord", "v")
    val out = Cleaning.dedupKeepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").as[(Int, Int, String)].collect()
    assert(out.toSeq == Seq((1, 5, "first"), (2, 7, "only")))
  }

  test("winsorize: boundary stays, above-threshold capped (ref 300→200 quirk)") {
    val df = Seq(299.0, 300.0, 300.5, 1000.0).toDF("age")
    val out = Cleaning.winsorize(df, "age", 300, 200).as[Double].collect()
    assert(out.toSeq == Seq(299.0, 300.0, 200.0, 200.0))
  }

  test("titleCase handles hyphens/apostrophes like str_to_title") {
    val df = Seq("SAINT-MARTIN - OËSTRES", "l'EUROPE").toDF("s")
    val out = Cleaning.titleCase(df, "s").as[String].collect()
    // initcap capitalizes after any non-letter — matches R str_to_title here
    assert(out.toSeq == Seq("Saint-Martin - Oëstres", "L'Europe"))
  }

  test("relabel replaces literal values (regex metachars are quoted)") {
    val df = Seq("Adulte", "Jeune", "a.b").toDF("s")
    assert(Cleaning.relabel(df, "s", "Adulte", "adulte").as[String].collect().toSeq ==
      Seq("adulte", "Jeune", "a.b"))
    assert(Cleaning.relabel(df, "s", "a.b", "X").as[String].collect().toSeq ==
      Seq("Adulte", "Jeune", "X"))
  }

  test("fillUnknown fills only nulls on the named string columns") {
    val df = Seq((Some("a"), None: Option[String]), (None, Some("b")))
      .toDF("x", "y")
    val out = Cleaning.fillUnknown(df, "Inconnue", Seq("x", "y"))
      .as[(String, String)].collect()
    assert(out.toSeq == Seq(("a", "Inconnue"), ("Inconnue", "b")))
  }

  test("sanityFilter is off by default (reference abandoned it)") {
    val df = Seq((5.0, 10.0)).toDF("haut_tot", "haut_tronc")
    assert(Cleaning.sanityFilter(df, col("haut_tot") >= col("haut_tronc")).count() == 1)
    assert(Cleaning.sanityFilter(df, col("haut_tot") >= col("haut_tronc"),
      enabled = true).count() == 0)
  }

  test("dropColsByPrefix drops exactly the prefixed columns (P9)") {
    val df = Seq((1, 2, 3)).toDF("villeca_x", "villeca_y", "keep")
    val out = Cleaning.dropColsByPrefix(df, "villeca_")
    assert(out.columns.toSeq == Seq("keep"))
  }

  test("cleaning pipeline is idempotent (clean(clean(x)) == clean(x))") {
    val df = Seq(("  ", 400.0), ("ok", 50.0), (null, 301.0)).toDF("s", "v")
    def clean(d: org.apache.spark.sql.DataFrame) =
      Cleaning.winsorize(Cleaning.normalizeBlanks(d, Seq("s")), "v", 300, 200)
    val once = clean(df).collect().toSeq
    val twice = clean(clean(df)).collect().toSeq
    assert(once == twice)
  }
}
