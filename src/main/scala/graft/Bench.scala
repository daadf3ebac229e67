package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Convention per BASELINE.md: warm JVM (one discarded warmup pass of
  * the first query), median of SPARK_GRAFT_BENCH_RUNS (default 3).
  *
  * Failures are first-class: a query that throws is recorded as -1.0
  * (never a bogus fast "time"), and its name + error are logged to
  * stderr at warm-up so a broken query can't silently deflate totals.
  * The JSON line is ALSO written to SPARK_GRAFT_BENCH_OUT (default
  * bench_result.json in the cwd) so the driver can read it even when
  * sbt pollutes stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 5 runs: the median absorbs driver-side optimizer-time variance
    // (p05's 166-rule constant fold swings ~10% run to run at 3)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    val spark = GraftSession.build(appName = "graft-bench")
    // optional subset filter (regex) for local bisection
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    // warmup: executes one full pass so JIT/codegen/file-listing caches
    // are hot before anything is timed; failures are named, not hidden
    qs.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] WARMUP FAILURE $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    val results = qs.map { case (name, fn) =>
      var failed = false
      // isolate queries from each other's leaked cache entries: 50+
      // queries × per-call caches otherwise fill storage memory and
      // LRU-evict the CURRENT query's cache mid-run (observed 3-5x
      // inflation on cache-heavy queries) — every query is measured
      // against a clean cache, warm JVM
      spark.catalog.clearCache()
      // clearCache only drops TABLE cache entries; localCheckpoint()
      // blocks are persistent RDDs that survive it. The iterative
      // operators (cc, pagerank, k-core, BPE, prefix) checkpoint per
      // round, so a full suite pass strands hundreds of blocks that
      // crowd storage memory and inflate later queries (x18 measured
      // 5.1s in-suite vs 3.1s isolated before this). Each timed run
      // rebuilds its own checkpoints, so dropping stale ones is safe.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // settle the heap between queries: 100+ queries of driver-side
      // plan/codegen allocation otherwise bleed GC pressure into late
      // queries (x18 measured 4.5 s isolated vs 6.6 s at position
      // ~110 of a 147-query session); one explicit collection per
      // query keeps per-query numbers comparable across rounds
      System.gc()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] FAILURE $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> (if (failed) -1.0 else times(times.length / 2))
    }
    val failures = results.count(_._2 < 0)
    val qsJson = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsJson,"failures":$failures,"sf":"$sfDir"}"""
    println(line)
    try {
      val w = new java.io.PrintWriter(outPath)
      try w.println(line) finally w.close()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
