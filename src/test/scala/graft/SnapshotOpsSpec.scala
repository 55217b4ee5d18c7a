package graft

import graft.operators.{Scd2, Upsert}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-style snapshot upsert + SCD2 history build (q127/q128). */
class SnapshotOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L))
    .toDF("id", "name", "v")

  test("upsert applies update, delete, and insert; untouched rows survive") {
    val changes = Seq(
      (2L, "beta2", 22L, "update"),
      (3L, "gamma", 30L, "delete"),
      (9L, "new", 99L, "insert")).toDF("id", "name", "v", "op")
    val out = Upsert(snap, changes, "id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "alpha", 10L), (2L, "beta2", 22L), (9L, "new", 99L)))
  }

  test("upsert with an empty changeset is the identity") {
    val changes = Seq.empty[(Long, String, Long, String)]
      .toDF("id", "name", "v", "op")
    val out = Upsert(snap, changes, "id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L)))
  }

  test("scd2 intervals chain gap-free with exactly one current row per key") {
    val log = Seq(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "c"),
      (2L, 150L, 4L, "x"))
      .toDF("key", "t", "seq", "attr")
    val out = Scd2.intervals(log, "key", "t", "seq")
      .select("key", "t", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
    // per key: exactly one open (current) interval
    assert(out.count(_._5) == 2)
    // chain: valid_to of row n == valid_from of row n+1, ordered by t
    val k1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(k1.map(_._3).toSeq == Seq(100L, 200L, 300L))
    assert(k1.map(_._4).toSeq == Seq(Some(200L), Some(300L), None))
  }

  test("scd2 breaks same-timestamp ties deterministically by the tiebreak column") {
    val log = Seq((1L, 100L, 2L, "late"), (1L, 100L, 1L, "early"))
      .toDF("key", "t", "seq", "attr")
    val out = Scd2.intervals(log, "key", "t", "seq")
      .select("seq", "valid_to", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1)
    // seq 1 is superseded by seq 2 at the same instant; seq 2 is current
    assert(out.toSeq == Seq((1L, Some(100L), false), (2L, None, true)))
  }

  test("snapshot diff statuses match a driver-side replay of the key sets") {
    val got = Queries.queries("q155_snapshot_diff")(spark, TestSpark.sf0001)
      .select("status", "cnt").as[(String, Long)].collect().toMap
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "value").as[(Long, Double)].collect()
    val oldKeys = ev.filter(_._1 % 4 != 0).map(_._1).toSet
    val newKeys = ev.filter(_._1 % 5 != 0).map(_._1).toSet
    val added = (newKeys -- oldKeys).size.toLong
    val removed = (oldKeys -- newKeys).size.toLong
    // changed = shared keys whose value was bumped (id % 7 == 0)
    val shared = oldKeys & newKeys
    val changed = shared.count(_ % 7 == 0).toLong
    val unchanged = shared.size - changed
    assert(got.getOrElse("added", 0L) == added)
    assert(got.getOrElse("removed", 0L) == removed)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.getOrElse("unchanged", 0L) == unchanged)
  }

  test("q315: dynamic overwrite rewrites one day and leaves the rest intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dynover").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-01-10 06:00:00"), 10.0),
        (2L, ts("2024-01-10 18:00:00"), 5.0),
        (3L, ts("2024-01-11 06:00:00"), 7.0))
      .toDF("event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.queries("q315_dynamic_overwrite")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map { case (dt, c, sv) => dt -> ((c, sv)) }.toMap
    // day 10 doubled (30.0), day 11 untouched — proving the overwrite was
    // scoped to the written partition, not a table truncate
    assert(r == Map("2024-01-10" -> (2L, 30.0), "2024-01-11" -> (1L, 7.0)))
  }
}
