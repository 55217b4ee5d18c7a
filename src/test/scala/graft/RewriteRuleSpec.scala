package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule rewriting min_by(p, struct(d, t)) into the
  * hash-aggregable arg_min_by (GraftExtensions). */
class RewriteRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    ("g1", "far", 9.0, 1L), ("g1", "near", 1.0, 2L), ("g1", "tie", 1.0, 3L),
    ("g2", "only", 5.0, 9L))

  test("rewritten plan uses ObjectHashAggregate, not SortAggregate") {
    val df = rows.toDF("g", "name", "dist", "id")
      .groupBy("g").agg(min_by(col("name"), struct(col("dist"), col("id"))).as("best"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("arg_min_by"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("rewritten result matches min_by semantics incl. tiebreak") {
    val out = rows.toDF("g", "name", "dist", "id")
      .groupBy("g").agg(min_by(col("name"), struct(col("dist"), col("id"))).as("best"))
      .as[(String, String)].collect().toMap
    assert(out == Map("g1" -> "near", "g2" -> "only"))
  }

  test("NaN ordering matches struct semantics (NaN sorts greatest)") {
    val df = Seq(("g", "nan_row", Double.NaN, 1L), ("g", "real", 100.0, 2L))
      .toDF("g", "name", "dist", "id")
      .groupBy("g").agg(min_by(col("name"), struct(col("dist"), col("id"))).as("best"))
    assert(df.as[(String, String)].collect().toMap == Map("g" -> "real"))
  }

  test("nullable ordering fields are NOT rewritten (null-field SQL semantics kept)") {
    // builtin MinBy compares the struct, where a null field sorts SMALLEST —
    // the d=NULL row must win; ArgMinBy would skip it, so the rewrite must
    // not fire here.
    val df = Seq(("g", "null_d", Option.empty[Double], 1L),
        ("g", "real", Some(5.0), 2L))
      .toDF("g", "name", "dist", "id")
      .groupBy("g").agg(min_by(col("name"), struct(col("dist"), col("id"))).as("best"))
    assert(!df.queryExecution.executedPlan.toString.contains("arg_min_by"))
    assert(df.as[(String, String)].collect().toMap == Map("g" -> "null_d"))
  }

  test("non-matching shapes are left alone (3-field struct)") {
    val df = rows.toDF("g", "name", "dist", "id")
      .groupBy("g").agg(min_by(col("name"),
        struct(col("dist"), col("id"), col("name"))).as("best"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("arg_min_by"), plan)
    // still correct, just the slow path
    assert(df.as[(String, String)].collect().toMap ==
      Map("g1" -> "near", "g2" -> "only"))
  }
}
