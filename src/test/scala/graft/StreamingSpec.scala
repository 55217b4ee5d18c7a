package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowedCounts (streaming) equals the batch aggregation") {
    val stream = EventsStream.windowedCounts(spark, TestSpark.sf0001)
      .orderBy("win_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("win_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("append-mode (watermark-bounded) windows are exactly the sealed complete-mode windows") {
    val complete = EventsStream.windowedCounts(spark, TestSpark.sf0001)
      .as[(Long, String, Long, Double)].collect().toSet
    val append = EventsStream.windowedCountsAppend(spark, TestSpark.sf0001)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(append.nonEmpty)
    assert(append.subsetOf(complete))
    // everything missing from append belongs to the final unsealed hour
    val maxSealed = append.map(_._1).max
    assert(complete.diff(append).forall(_._1 > maxSealed))
  }

  test("stateful (flatMapGroupsWithState) sessionization matches the batch closed sessions") {
    val stateful = EventsStream.sessionizeStateful(spark, TestSpark.sf0001, 30)
      .select("user_id", "session_seq", "n_events", "session_start", "session_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val batch = EventsStream.sessionize(spark, TestSpark.sf0001, 30)
      .select("user_id", "session_seq", "n_events", "session_start", "session_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // streaming emits sessions closed by the event-time timeout; every one
    // of them must be a session the batch form also derives
    assert(stateful.nonEmpty)
    assert(stateful.subsetOf(batch),
      s"stateful-only sessions: ${stateful.diff(batch).take(3)}")
  }

  test("stateful sessionization emits EXACTLY the provably-closed sessions (q67 oracle predicate)") {
    // The q67 DuckDB oracle's predicate, derived in Spark: emit every
    // non-last session per user, plus the last session iff its event-time
    // timeout (last_ts_sec*1000 + gapMs) fires STRICTLY below the terminal
    // watermark (floor(max event-time ms) - gapMs). This pins the oracle's
    // semantics in-engine, replacing the old tools/ProbeStateful scratch.
    import org.apache.spark.sql.expressions.Window
    val gapMs = 30 * 60 * 1000L
    val ev = Tables.events(spark, TestSpark.sf0001)
    val maxMs = ev.agg(max(unix_millis(col("ts")))).as[Long].first()
    val wmMs = maxMs - gapMs
    val w = Window.partitionBy("user_id")
    val expected = EventsStream.sessionize(spark, TestSpark.sf0001, 30)
      .join(
        ev.withColumn("prev_ts", lag(col("ts"), 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
              .otherwise(0L))
          .withColumn("session_seq", sum(col("new_session")).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_seq")
          .agg(max(unix_timestamp(col("ts"))).as("last_ts")),
        Seq("user_id", "session_seq"))
      .withColumn("max_seq", max("session_seq").over(w))
      .filter(col("session_seq") < col("max_seq") ||
        col("last_ts") * 1000 + gapMs < wmMs)
      .select("user_id", "session_seq", "n_events", "session_start", "session_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val stateful = EventsStream.sessionizeStateful(spark, TestSpark.sf0001, 30)
      .select("user_id", "session_seq", "n_events", "session_start", "session_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(stateful == expected,
      s"stateful-only: ${stateful.diff(expected).take(3)}; " +
        s"expected-only: ${expected.diff(stateful).take(3)}")
  }

  test("streaming dedup (watermarked dropDuplicates) matches batch distinct counts") {
    val stream = EventsStream.dedupStreamCounts(spark, TestSpark.sf0001)
      .as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, TestSpark.sf0001)
      .dropDuplicates("event_id")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(stream == batch)
    assert(stream.values.sum == 1000)
  }

  test("cleaning operators compose onto a stream unchanged (stream == batch clean)") {
    import graft.operators.Cleaning
    val stream = EventsStream.cleanStream(spark, TestSpark.sf0001)
      .select("event_id", "value", "props").as[(Long, Double, String)]
      .collect().sortBy(_._1).toSeq
    val batch = Cleaning.winsorize(
        Cleaning.normalizeBlanks(Tables.events(spark, TestSpark.sf0001),
          Seq("props", "event_type")), "value", 400.0, 300.0)
      .select("event_id", "value", "props").as[(Long, Double, String)]
      .collect().sortBy(_._1).toSeq
    assert(stream == batch)
    assert(stream.size == 1000)
  }

  test("sessionize: session boundaries at the idle gap, totals consistent") {
    val out = EventsStream.sessionize(spark, TestSpark.sf0001, 30)
    val total = out.agg(sum("n_events")).as[Long].first()
    val input = Tables.events(spark, TestSpark.sf0001).count()
    assert(total == input) // every event lands in exactly one session
    // session_seq starts at 1 per user and is dense
    val perUser = out.groupBy("user_id")
      .agg(min("session_seq").as("mn"), max("session_seq").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(perUser.count() == 0)
  }
}
