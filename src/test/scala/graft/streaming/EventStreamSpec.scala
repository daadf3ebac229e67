package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed hourly counts equal the batch q17 result") {
    val streamed = EventStream.runHourlyOnce(spark,
      "/root/testdata/sf0.001/events.parquet")
    val batch = graft.SparkEntry.queries("q17_events_hourly_window")(
      spark, "/root/testdata/sf0.001")
    // batch emits ntz timestamps; align types before diffing
    val s = streamed.withColumn("hour_ts", $"hour_ts".cast("timestamp_ntz"))
    assert(s.count() > 0)
    assert(s.exceptAll(batch).isEmpty && batch.exceptAll(s).isEmpty)
  }

  test("flatMapGroupsWithState sessionization matches batch session_window") {
    import EventStream._
    val ev = graft.tables.t(spark, "/root/testdata/sf0.001", "events")
      .filter($"user_id" < 10)
    val typed = ev.select($"event_id", $"ts".cast("timestamp").as("ts"),
      $"user_id", $"event_type", $"value").as[Event]
    // batch-mode execution of the streaming operator: every event of a
    // group arrives in one invocation, so closed + final-provisional
    // sessions are exactly the gap-split
    // multiset of (user, n_events, sum_value) — session starts are
    // implied by the gap split, and timestamp-type round-trips differ
    val streamed = sessionizeStream(typed, gapMinutes = 30).collect()
      .map(s => (s.user_id, s.n_events, s.sum_value)).sorted.toSeq
    val batch = graft.ext.Temporal.sessionize(ev,
        key = "user_id", ts = "ts", value = "value", gap = "30 minutes")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("n_events")),
        r.getDouble(r.fieldIndex("sum_value")))).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful user sessions accumulate per key") {
    import EventStream._
    val events = Seq(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.5),
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1, "view", 2.5),
      Event(3, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2, "click", 10.0),
    ).toDS()
    val out = userSessions(events).collect().map(s => s.user_id -> s).toMap
    assert(out(1L).n_events == 2 && out(1L).total_value == 4.0)
    assert(out(2L).n_events == 1 && out(2L).total_value == 10.0)
  }
}
