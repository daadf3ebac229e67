package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: prior match, inclusive tie, and no-prior-row null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // prior click at 09:00
      (2L, 10L, ts("2024-01-01 09:00:00")),  // tie: click AT 09:00 matches
      (3L, 20L, ts("2024-01-01 08:00:00")),  // user 20 has later clicks only
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), 5.0),
      (101L, 10L, ts("2024-01-01 08:00:00"), 3.0),
      (102L, 20L, ts("2024-01-01 09:30:00"), 7.0),
    ).toDF("event_id", "user_id", "ts", "value")

    val out = Temporal.asOfJoin(left, right, "user_id", "ts", "event_id",
        Seq("event_id", "value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id"))).toMap
    assert(out(1L).contains(100L))   // most recent prior
    assert(out(2L).contains(100L))   // equal-ts inclusive
    assert(out(3L).isEmpty)          // nothing at or before → null
  }

  test("sessionize merges events within the gap and splits across it") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:20:00"), 2.0),  // within 30min → same session
      (1L, ts("2024-01-01 11:30:00"), 4.0),  // 70min gap → new session
      (2L, ts("2024-01-01 10:00:00"), 8.0),
    ).toDF("user_id", "ts", "value")
    val out = Temporal.sessionize(ev, "user_id", "ts", "value", "30 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }
}
