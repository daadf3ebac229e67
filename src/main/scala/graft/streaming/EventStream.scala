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

  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        n_events: Long, sum_value: Double, closed: Boolean)

  /** Streaming gap-based sessionization via flatMapGroupsWithState +
    * event-time timeout — the custom-state path for semantics
    * `session_window` can't express (emit-on-close, provisional
    * updates). Gap semantics match [[graft.ext.Temporal.sessionize]]:
    * events ≤ `gapMinutes` apart share a session.
    *
    * Emission contract: a session is emitted `closed=true` when a
    * later event breaks the gap in-batch, or when the event-time
    * timeout fires (watermark passed last+gap); the currently-open
    * session is emitted `closed=false` each batch it grows —
    * downstream readers key on (user_id, session_start) and take the
    * latest row, the standard provisional-append pattern. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    def out(uid: Long, s: SessionState, closed: Boolean) =
      SessionOut(uid, new java.sql.Timestamp(s.startMs), s.n,
        math.round(s.sum * 100).toDouble / 100, closed)
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(out(uid, done, closed = true))
          } else {
            val wm = scala.util.Try(state.getCurrentWatermarkMs())
              .getOrElse(Long.MinValue)
            // per-trigger group slices are unordered; sort in memory
            // (bounded by the trigger's batch, not the stream)
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption.orNull
            val closedOut = Seq.newBuilder[SessionOut]
            evs.foreach { e =>
              val t = e.ts.getTime
              if (open == null) open = SessionState(t, t, 1L, e.value)
              else if (math.abs(t - open.lastMs) <= gapMs)
                // in-gap (possibly out-of-order within the window):
                // fold in, extending either edge
                open = SessionState(math.min(open.startMs, t),
                  math.max(open.lastMs, t), open.n + 1, open.sum + e.value)
              else if (t > open.lastMs + gapMs) {
                closedOut += out(uid, open, closed = true)
                open = SessionState(t, t, 1L, e.value)
              }
              // else: late beyond the open session's window — dropped,
              // standard watermark semantics
            }
            state.update(open)
            // the timeout may never sit below the current watermark
            // (late data can leave last+gap in the past)
            state.setTimeoutTimestamp(math.max(open.lastMs + gapMs, wm + 1L))
            (closedOut.result() :+ out(uid, open, closed = false)).iterator
          }
      }
  }

  /** Gap-based streaming sessionization via the BUILT-IN
    * `session_window` aggregate — the path to prefer over
    * [[sessionizeStream]]'s hand-rolled flatMapGroupsWithState when
    * emit-on-close-only semantics suffice: Catalyst plans native
    * merging-session state (SessionWindowStateStore*Exec) with
    * watermark-driven eviction, so there is no user state shape to
    * version, and partial sessions from different triggers MERGE in
    * the store (an f1-trigger session extends when f2's events land
    * in its gap — spec-proven). Output contract matches
    * [[graft.ext.Temporal.sessionize]] exactly (same DECIMAL sum
    * pinning), so stream == batch on the same events; in append mode
    * a session emits once, when the watermark passes its close.
    * State per open session is one (key, window, partials) row —
    * bounded by live sessions, not events. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Per-hour heavy-hitter event types: the
    * [[graft.functions.HeavyHittersAgg]] SpaceSaving sketch under a
    * streaming event-time window. Streaming state per window is ONE
    * cap-slot summary — never the item stream — so hot-key discovery
    * over an unbounded firehose of unbounded key cardinality runs in
    * bounded memory, where a windowed `GROUP BY key` grows state with
    * the number of distinct keys. Applied to a batch frame it is the
    * same plan minus the watermark (the spec pins stream == batch in
    * the sketch's exact regime). */
  def hourlyHotTypes(events: DataFrame, cap: Int = 64): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.HeavyHittersAgg
        .heavyHitters(col("event_type"), cap).as("hh"))
      .select(col("w.start").as("hour_ts"), explode(col("hh")).as("h"))
      .select(col("hour_ts"), col("h.item").as("event_type"),
        col("h.est").as("est"), col("h.err").as("err"))

  /** Streaming exact dedup: drops re-occurrences of the same content
    * digest within the watermark window — the streaming counterpart of
    * [[graft.ext.Dedup.exactDupGroups]]'s md5 content identity, for
    * dedup-at-ingest pipelines. `dropDuplicatesWithinWatermark` keys
    * state on the digest only (not event time), yet evicts each key
    * once the watermark passes its expiry — the property that keeps
    * exact-dedup state BOUNDED on an unbounded stream (a plain
    * streaming dropDuplicates accumulates keys forever). Duplicates
    * separated by more than the watermark interval are re-admitted;
    * choose the interval from the duplicate-arrival-lag distribution. */
  def dedupByDigest(events: DataFrame, payload: String, ts: String,
                    watermark: String): DataFrame =
    events
      .withColumn("digest", md5(col(payload).cast("binary")))
      .withWatermark(ts, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Stream-stream interval join (e.g. click attribution): rows of
    * `left` match rows of `right` with the same `key` whose event time
    * falls in [leftTs, leftTs + within]. Both sides carry a watermark
    * equal to the join window, which is what lets Spark BOUND the join
    * state: a buffered left row is dropped once the right watermark
    * passes leftTs + within, so state never grows with the stream.
    * Output columns are prefixed l_/r_ to keep the join self-merge
    * unambiguous. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String = "10 minutes"): DataFrame = {
    val l = left.select(
      left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
      .withWatermark(s"l_ts", within)
    val r = right.select(
      right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withWatermark(s"r_ts", within)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
  }

  /** Stream-static enrichment: join the streaming facts against a
    * static (batch) dimension on `key`, then windowed counts per
    * dimension attribute. The static side is re-planned per
    * micro-batch (so a dimension refresh is picked up) and broadcast —
    * the stream never shuffles for the join; only the windowed agg
    * shuffles, on (window, attr). The standard shape for enriching an
    * event firehose with reference data at scale. */
  def enrichedHourly(events: DataFrame, dim: DataFrame,
                     key: String, attr: String): DataFrame =
    events.withWatermark("ts", "2 hours")
      .join(broadcast(dim.select(col(key), col(attr))), Seq(key))
      .groupBy(window(col("ts"), "1 hour"), col(attr))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_ts"), col(attr), col("n_events"))

  /** Idempotent micro-batch write into a lake directory: each batch
    * lands wholesale under `batch=<id>/`, so a replayed batch (the
    * at-least-once delivery Structured Streaming gives foreachBatch
    * after a failure) OVERWRITES its own directory instead of
    * appending duplicates — exactly-once by construction, no
    * transaction log needed. Consumers read `root` and get the
    * batch id as a partition column for free. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, root: String): Unit =
    batch.write.mode("overwrite").parquet(s"$root/batch=$batchId")

  /** Continuous lake sink wiring `writeBatchIdempotent` through
    * foreachBatch; checkpointed, so batch ids are stable across
    * restarts (the pair that makes the idempotency hold end-to-end). */
  def sinkToLake(stream: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        writeBatchIdempotent(b, id, root)
      }
      .start()

  case class RunTotals(user_id: Long, n_events: Long, sum_cents: Long)

  /** Per-user running totals on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): one typed ValueState row per
    * user, updated per micro-batch — the successor to
    * mapGroupsWithState that [[userSessions]] uses, with explicitly
    * named state, per-state TTL support and a RocksDB-backed store
    * (state no longer bounded by executor heap — the 100 TB-side
    * requirement for billions of keys). Values are pinned to integer
    * cents so the running sum is exact under any batch split.
    *
    * Kept beside the v1 operators deliberately: same semantics, both
    * APIs exercised, specs pin stream==batch parity for each. */
  class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, RunTotals] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[RunTotals] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode)
        : Unit =
      st = getHandle.getValueState[RunTotals]("totals",
        org.apache.spark.sql.Encoders.product[RunTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunTotals] = {
      val p = if (st.exists()) st.get() else RunTotals(key, 0L, 0L)
      var n = p.n_events
      var cents = p.sum_cents
      rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
      val next = RunTotals(key, n, cents)
      st.update(next)
      Iterator.single(next)
    }
  }

  /** [[RunningTotalsProcessor]] wired onto a typed event stream;
    * requires the RocksDB state-store provider (see spec). */
  def runningTotalsTws(events: Dataset[Event]): Dataset[RunTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Normalize an event frame's `ts` to a true TimestampType —
    * watermarks reject both spellings files actually use:
    * TIMESTAMP(NANOS) (a LongType under nanosAsLong) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ). The
    * session runs in UTC, so the NTZ cast is an identity relabel. */
  def normalizeTs(df: DataFrame,
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
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
    val withTs = normalizeTs(stream, schema)
    val q = hourlyCounts(withTs).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_hourly")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("graft_hourly")
  }
}
