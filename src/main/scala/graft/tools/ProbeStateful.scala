package graft.tools

import graft.streaming.EventsStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: characterize exactly which batch sessions the stateful
  * (flatMapGroupsWithState) sessionizer emits over a static table, to pin
  * the q67 oracle's predicate. */
object ProbeStateful {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batch = EventsStream.sessionize(spark, dir, 30)
      .withColumnRenamed("session_value", "sv").cache()
    val stateful = EventsStream.sessionizeStateful(spark, dir, 30)
      .withColumnRenamed("session_value", "sv2").cache()
    val nb = batch.count(); val ns = stateful.count()
    println(s"batch=$nb stateful=$ns")

    // sessions in batch but not stateful
    val missing = batch.join(stateful,
      Seq("user_id", "session_seq"), "left_anti").cache()
    println(s"missing=${missing.count()}")

    // per-user last session + its end ts; maxTs overall
    val ev = graft.Tables.events(spark, dir)
    val maxTs = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    println(s"maxTs=$maxTs")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val lastSeq = batch.withColumn("max_seq", max("session_seq").over(w))
    val lastOnly = lastSeq.filter(col("session_seq") === col("max_seq"))
    println(s"lastSessions=${lastOnly.count()}")
    // does missing == exactly the last sessions that did NOT time out?
    // compute each session's last event ts
    val sess = EventsStream.sessionize(spark, dir, 30)
    val sessEnd = {
      import org.apache.spark.sql.expressions.Window
      val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.withColumn("prev_ts", lag(col("ts"), 1).over(w2))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(
          w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(max(unix_timestamp(col("ts"))).as("last_ts"))
    }
    val miss2 = missing.join(sessEnd, Seq("user_id", "session_seq"))
      .withColumn("is_last", lit(null)) // placeholder
    // distribution of (maxTs - last_ts) for missing sessions:
    miss2.select(min(col("last_ts")), max(col("last_ts"))).show()
    println("missing with last_ts <= maxTs - 3600 (i.e. should have timed out): " +
      miss2.filter(col("last_ts") * 1000 + 1800000 <= (maxTs - 1800) * 1000).count())
    // H1 check: missing == last sessions?
    val lastKeys = lastOnly.select("user_id", "session_seq")
    println("missing that are NOT the user's last session: " +
      missing.join(lastKeys, Seq("user_id", "session_seq"), "left_anti").count())
    println("last sessions that were EMITTED: " +
      lastKeys.join(stateful, Seq("user_id", "session_seq"), "left_semi").count())
    // for emitted last sessions: their last_ts distribution vs timeout
    val emittedLast = lastKeys.join(stateful, Seq("user_id", "session_seq"), "left_semi")
      .join(sessEnd, Seq("user_id", "session_seq"))
    println("emitted last sessions min/max last_ts:")
    emittedLast.select(min("last_ts"), max("last_ts")).show()
    println(s"timeout boundary: lastTs + 1800 < maxTs - 1800  i.e. last_ts < ${maxTs - 3600}")
    spark.stop()
  }
}
