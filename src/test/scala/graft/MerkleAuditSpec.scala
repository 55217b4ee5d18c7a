package graft

import graft.io.MerkleAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** io.MerkleAudit table digests (q239): the integrity-audit invariants —
  * order independence, change sensitivity, and the prefix-width fan-out
  * contract. */
class MerkleAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
    (6L, "f"), (7L, "g"), (8L, "h")).toDF("id", "s")

  private def root(df: org.apache.spark.sql.DataFrame, w: Int): String =
    MerkleAudit.tableDigest(df, Seq(col("id"), col("s")), w)
      .filter(col("bucket") === "__root").head().getString(1)

  test("same logical table -> same root, regardless of row/partition order") {
    val shuffled = base.orderBy(rand(42)).repartition(7)
    assert(root(base, 2) == root(shuffled, 2))
  }

  test("a single changed row flips the root") {
    val mutated = base.withColumn("s",
      when(col("id") === 5L, lit("E")).otherwise(col("s")))
    assert(root(base, 2) != root(mutated, 2))
  }

  test("prefix width sets the fan-out; every row hash lands in a bucket") {
    val d1 = MerkleAudit.tableDigest(base, Seq(col("id"), col("s")), 1)
    // 16^1 possible buckets; 8 rows -> at most 8 non-root buckets, each a
    // single hex char
    val buckets = d1.filter(col("bucket") =!= "__root").collect()
    assert(buckets.nonEmpty && buckets.length <= 8)
    assert(buckets.forall(_.getString(0).length == 1))
    // widths are part of the contract: different widths give different
    // (equally valid) roots for the same data
    assert(root(base, 1) != root(base, 2))
  }

  test("row encoding is injection-proof: column boundaries can't move") {
    // a '|'-join encoding would collide these two tables
    val ab_c = Seq(("a|b", "c")).toDF("x", "y")
    val a_bc = Seq(("a", "b|c")).toDF("x", "y")
    assert(root2(ab_c) != root2(a_bc))
    // and would collide null with empty-string (concat_ws drops nulls)
    val withNull = Seq((Option.empty[String], "v")).toDF("x", "y")
    val withEmpty = Seq((Option(""), "v")).toDF("x", "y")
    assert(root2(withNull) != root2(withEmpty))
  }

  private def root2(df: org.apache.spark.sql.DataFrame): String =
    MerkleAudit.tableDigest(df, Seq(col("x"), col("y")), 2)
      .filter(col("bucket") === "__root").head().getString(1)

  test("width outside [1, 8] fails loud") {
    intercept[IllegalArgumentException] {
      MerkleAudit.tableDigest(base, Seq(col("id")), 0)
    }
    intercept[IllegalArgumentException] {
      MerkleAudit.tableDigest(base, Seq(col("id")), 9)
    }
  }
}
