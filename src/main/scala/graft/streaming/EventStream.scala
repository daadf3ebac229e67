package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.b "Streaming").
  *
  * The reference is pure batch, so this is capability beyond parity:
  * the same event schema the batch engine aggregates (q17) processed
  * as a stream — tumbling event-time windows under a watermark, plus
  * a stateful per-user session aggregator via mapGroupsWithState.
  * Batch/stream unification: `hourlyCounts` applied to a batch frame
  * is exactly query q17's plan.
  */
object EventStream {

  /** Tumbling 1-hour windowed counts with a 10-minute watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Stateful per-user running session aggregate (custom state shape —
    * the mapGroupsWithState escape hatch for semantics windows can't
    * express). */
  def userSessions(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(UserSession(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserSession(uid, n, math.round(tot * 100).toDouble / 100)
          state.update(next)
          next
      }
  }

  /** Drive a parquet-backed stream of the events table through
    * `hourlyCounts` into an in-memory sink; returns the materialized
    * result. Used by specs and as executable documentation for the
    * readStream → transform → writeStream wiring. */
  def runHourlyOnce(spark: SparkSession, eventsPath: String): DataFrame = {
    // the parquet streaming source monitors a DIRECTORY; stage a bare
    // file into one so both layouts work
    val src = new java.io.File(eventsPath)
    val dir =
      if (src.isFile) {
        val d = java.nio.file.Files.createTempDirectory("graft_stream")
        java.nio.file.Files.copy(src.toPath, d.resolve(src.getName))
        d.toString
      } else eventsPath
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val withTs =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else stream
    val q = hourlyCounts(withTs).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_hourly")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("graft_hourly")
  }
}
