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

  test("sessionizeStream carries state across triggers (true streaming)") {
    import EventStream._
    // two files -> two triggers with maxFilesPerTrigger=1; user 1's
    // session spans both files (state must carry), then a gap breaks it
    val dir = java.nio.file.Files.createTempDirectory("sess_stream")
    def ev(id: Long, ts: String, uid: Long, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(ts), uid, "click", v)
    Seq(
      ev(1, "2024-01-01 00:00:00", 1, 1.0),
      ev(2, "2024-01-01 00:10:00", 1, 2.0),
    ).toDS().repartition(1).write.parquet(s"$dir/f1")
    Seq(
      ev(3, "2024-01-01 00:20:00", 1, 3.0),   // within gap → same session
      ev(4, "2024-01-01 02:00:00", 1, 5.0),   // 100-min gap → new session
      ev(5, "2024-01-01 00:00:00", 2, 7.0),
    ).toDS().repartition(1).write.parquet(s"$dir/f2")
    // stage as a single directory with 2 files
    val stage = java.nio.file.Files.createTempDirectory("sess_stage")
    Seq("f1", "f2").zipWithIndex.foreach { case (f, i) =>
      val src = new java.io.File(s"$dir/$f").listFiles()
        .filter(_.getName.endsWith(".parquet"))(0)
      val dst = stage.resolve(s"$f.parquet")
      java.nio.file.Files.copy(src.toPath, dst)
      // pin modification order so maxFilesPerTrigger picks f1 first
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    val schema = spark.read.parquet(stage.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
    val q = sessionizeStream(stream.as[Event], gapMinutes = 30).writeStream
      .outputMode("append").format("memory").queryName("graft_sessions")
      .start()
    q.processAllAvailable()
    q.stop()
    // latest row per (user, session_start) is the session's final state
    val rows = spark.table("graft_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val finalPerSession = rows.groupBy(t => (t._1, t._2))
      .map { case (_, v) => v.maxBy(_._3) }.toSet
      .map((t: (Long, String, Long, Double, Boolean)) => (t._1, t._3, t._4))
    // user 1: session of events 1-3 (n=3, sum=6.0) + session of event 4;
    // user 2: single event session
    assert(finalPerSession == Set((1L, 3L, 6.0), (1L, 1L, 5.0), (2L, 1L, 7.0)))
    // the 3-event session grew across triggers: a provisional n=2 row
    // must have been emitted by the first trigger
    assert(rows.exists(t => t._1 == 1L && t._3 == 2L && !t._5))
  }

  test("native session_window stream merges partial sessions across triggers") {
    import EventStream._
    def ev(id: Long, ts: String, uid: Long, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(ts), uid, "click", v)
    val f1 = Seq(
      ev(1, "2024-01-01 00:00:00", 1, 1.0),
      ev(2, "2024-01-01 00:10:00", 1, 2.0))
    val f2 = Seq(
      ev(3, "2024-01-01 00:20:00", 1, 3.0),   // lands in f1's gap → must MERGE
      ev(4, "2024-01-01 02:00:00", 1, 5.0),   // 100-min gap → new session
      ev(5, "2024-01-01 00:00:00", 2, 7.0),
      ev(99, "2024-01-02 10:00:00", 99, 0.0)) // watermark sentinel
    val stage = java.nio.file.Files.createTempDirectory("swin_stream")
    Seq(f1, f2).zipWithIndex.foreach { case (evs, i) =>
      val dir = java.nio.file.Files.createTempDirectory("swin_part")
      evs.toDS().repartition(1).write.parquet(s"$dir/w")
      val src = new java.io.File(s"$dir/w").listFiles()
        .filter(_.getName.endsWith(".parquet"))(0)
      val dst = stage.resolve(s"$i.parquet")
      java.nio.file.Files.copy(src.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(3000000L + i * 60000L))
    }
    val schema = spark.read.parquet(stage.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
    val q = sessionWindowStream(stream).writeStream
      .outputMode("append").format("memory").queryName("graft_swin").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_swin").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    // append mode emits each closed session exactly once after the
    // sentinel advances the watermark; the sentinel's own session
    // stays open and must NOT appear
    assert(got == Set(
      (1L, "2024-01-01T00:00", 3L, 6.0),
      (1L, "2024-01-01T02:00", 1L, 5.0),
      (2L, "2024-01-01T00:00", 1L, 7.0)))
    // contract parity: batch sessionize over the same closed events
    val batch = graft.ext.Temporal.sessionize(
        (f1 ++ f2).filter(_.user_id != 99).toDS().toDF(),
        key = "user_id", ts = "ts", value = "value", gap = "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(batch == got)
  }

  test("streaming digest dedup drops cross-trigger duplicates") {
    def ev(id: Long, ts: String, payload: String) =
      (id, java.sql.Timestamp.valueOf(ts), payload)
    val stage = java.nio.file.Files.createTempDirectory("dedup_stream")
    Seq(ev(1, "2024-01-01 00:00:00", "alpha"),
        ev(2, "2024-01-01 00:01:00", "beta"))
      .toDF("event_id", "ts", "payload").repartition(1)
      .write.parquet(s"$stage/f1.dir")
    Seq(ev(3, "2024-01-01 00:02:00", "alpha"),  // dup of 1, later trigger
        ev(4, "2024-01-01 00:03:00", "gamma"))
      .toDF("event_id", "ts", "payload").repartition(1)
      .write.parquet(s"$stage/f2.dir")
    val flat = java.nio.file.Files.createTempDirectory("dedup_flat")
    Seq("f1.dir", "f2.dir").zipWithIndex.foreach { case (f, i) =>
      val src = new java.io.File(s"$stage/$f").listFiles()
        .filter(_.getName.endsWith(".parquet"))(0)
      val dst = flat.resolve(s"$i.parquet")
      java.nio.file.Files.copy(src.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(2000000L + i * 60000L))
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStream.dedupByDigest(stream, "payload", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("graft_dedup").collect()
      .map(_.getAs[Long]("event_id")).toSet
    // the duplicate payload arriving in a LATER trigger is dropped —
    // digest state carried across triggers
    assert(kept == Set(1L, 2L, 4L))
  }

  test("stream-static enrichment join equals the batch equivalent") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.tables.t(spark, dir, "events")
    // static dimension: user → segment (derived, deterministic)
    val dim = events.select($"user_id").distinct()
      .withColumn("segment", concat(lit("seg"), $"user_id" % 4))
    // stage the events file into a directory for the parquet source
    val stage = java.nio.file.Files.createTempDirectory("enrich_stream")
    java.nio.file.Files.copy(
      new java.io.File(s"$dir/events.parquet").toPath,
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(stage.toString).schema
    val raw = spark.readStream.schema(schema).parquet(stage.toString)
    val stream = EventStream.normalizeTs(raw, schema)
    val q = EventStream.enrichedHourly(stream, dim, "user_id", "segment")
      .writeStream.outputMode("complete").format("memory")
      .queryName("graft_enriched").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_enriched")
    val batch = events.join(dim, Seq("user_id"))
      .groupBy(window($"ts", "1 hour"), $"segment")
      .agg(count(lit(1)).as("n_events"))
      .select($"window.start".as("hour_ts"), $"segment", $"n_events")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join attributes within the window only") {
    def row(id: Long, ts: String, uid: Long) =
      (id, java.sql.Timestamp.valueOf(ts), uid)
    val imps = java.nio.file.Files.createTempDirectory("ij_imp")
    val clicks = java.nio.file.Files.createTempDirectory("ij_clk")
    Seq(row(1, "2024-01-01 00:00:00", 7),   // clicked at :05 → match
        row(2, "2024-01-01 00:00:00", 8),   // clicked at :20 → outside 10m
        row(3, "2024-01-01 01:00:00", 9))   // never clicked
      .toDF("imp_id", "ts", "user_id").repartition(1)
      .write.parquet(s"$imps/f")
    Seq(row(11, "2024-01-01 00:05:00", 7),
        row(12, "2024-01-01 00:20:00", 8),
        row(13, "2023-12-31 23:55:00", 7))  // click BEFORE impression
      .toDF("click_id", "ts", "user_id").repartition(1)
      .write.parquet(s"$clicks/f")
    val lSchema = spark.read.parquet(s"$imps/f").schema
    val rSchema = spark.read.parquet(s"$clicks/f").schema
    val joined = EventStream.intervalJoin(
      spark.readStream.schema(lSchema).parquet(s"$imps/f"),
      spark.readStream.schema(rSchema).parquet(s"$clicks/f"),
      key = "user_id", within = "10 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("graft_attrib").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_attrib").collect()
      .map(r => (r.getAs[Long]("l_imp_id"), r.getAs[Long]("r_click_id"))).toSet
    assert(got == Set((1L, 11L)))
  }

  test("lake sink is idempotent: a replayed batch never duplicates") {
    val root = java.nio.file.Files.createTempDirectory("lake_sink").toString + "/t"
    val ck = java.nio.file.Files.createTempDirectory("lake_ck").toString
    val src = java.nio.file.Files.createTempDirectory("lake_src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1)
      .write.parquet(s"$src/f")
    val f = new java.io.File(s"$src/f").listFiles()
      .filter(_.getName.endsWith(".parquet"))(0)
    val stage = java.nio.file.Files.createTempDirectory("lake_stage")
    java.nio.file.Files.copy(f.toPath, stage.resolve("0.parquet"))
    val schema = spark.read.parquet(stage.toString).schema
    val q = EventStream.sinkToLake(
      spark.readStream.schema(schema).parquet(stage.toString), root, ck)
    q.processAllAvailable()
    q.stop()
    val first = spark.read.parquet(root).collect().toSet
    assert(first.map(r => (r.getLong(0), r.getString(1)))
      == Set((1L, "a"), (2L, "b")))
    // simulate the at-least-once replay foreachBatch can deliver:
    // re-run batch 0 directly — the overwrite lands in the same dir
    EventStream.writeBatchIdempotent(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L, root)
    assert(spark.read.parquet(root).collect().toSet == first)
  }

  test("streamed windowed heavy hitters equal the batch sketch (exact regime)") {
    val ev = graft.tables.t(spark, "/root/testdata/sf0.001", "events")
      .select($"ts".cast("timestamp").as("ts"), $"event_type")
    val dir = java.nio.file.Files.createTempDirectory("hot").toString + "/ev"
    ev.write.parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.hourlyHotTypes(stream, cap = 64).writeStream
      .outputMode("complete").format("memory").queryName("graft_hot").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_hot")
    val batch = EventStream.hourlyHotTypes(ev, cap = 64)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // exact regime: the five event types all fit the summary → err 0
    assert(streamed.agg(max($"err")).head().getLong(0) == 0L)
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

  test("transformWithState running totals carry RocksDB state across triggers") {
    import EventStream._
    def ev(id: Long, uid: Long, v: Double) =
      Event(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), uid,
        "click", v)
    // two files → two triggers; user 1 spans both (state must carry)
    val stage = java.nio.file.Files.createTempDirectory("tws_stage")
    Seq(Seq(ev(1, 1, 1.25), ev(2, 1, 2.25), ev(3, 2, 10.0)),
        Seq(ev(4, 1, 4.0), ev(5, 2, 0.5))).zipWithIndex.foreach {
      case (evs, i) =>
        val dir = java.nio.file.Files.createTempDirectory("tws_part")
        evs.toDS().repartition(1).write.parquet(s"$dir/w")
        val src = new java.io.File(s"$dir/w").listFiles()
          .filter(_.getName.endsWith(".parquet"))(0)
        val dst = stage.resolve(s"$i.parquet")
        java.nio.file.Files.copy(src.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(5000000L + i * 60000L))
    }
    // the v2 state API requires the RocksDB provider; scope it to
    // this query and restore the session default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(stage.toString).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.toString)
      val q = runningTotalsTws(stream.as[Event]).writeStream
        .outputMode("update").format("memory").queryName("graft_tws").start()
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("graft_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // final state per user: latest (largest n) row
      val fin = rows.groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
      assert(fin == Set((1L, 3L, 750L), (2L, 2L, 1050L)))
      // provisional first-trigger row for user 1 proves state carried
      // across triggers rather than recomputing from scratch
      assert(rows.contains((1L, 2L, 350L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
