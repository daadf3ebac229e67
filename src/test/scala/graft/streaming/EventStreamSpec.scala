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
