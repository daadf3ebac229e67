package graft

import org.apache.spark.sql.functions._

/** Ad-hoc measurement CLI — the SCALING.md instrument runner. Each
  * subcommand runs ONE audit/measurement exactly as documented in the
  * scaling record and prints a single JSON line (plus wall seconds),
  * so every filed SCALING.md number has a reproducible command:
  *
  * {{{
  * sbt "runMain graft.Audit ivf-recall <sfDir> <cos2Num> <cos2Den> <k>"
  *   // k = 0 resolves the corpus-aware Planes.nClustersFor default;
  *   // exhaustive (docSampleBits = 0), the x192 gate behavior
  * sbt "runMain graft.Audit time <queryName> <sfDir> [runs]"
  *   // median wall of one SparkEntry query, Bench's per-run hygiene
  * }}}
  *
  * Timing convention matches Bench: one discarded warm-up execution,
  * then the reported wall is a median over `runs` (default 3) with
  * cache/persistent-RDD/GC hygiene between runs.
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-audit")
    args.toList match {
      case "ivf-recall" :: sfDir :: num :: den :: k :: rest =>
        val bits = rest.headOption.map(_.toInt).getOrElse(0)
        val df = tables.t(spark, sfDir, "embeddings")
        def run(): String = {
          val row = ext.Dedup.semanticIvfAudit(df, "vec_id", "embedding",
            cos2Num = num.toLong, cos2Den = den.toLong,
            nClusters = k.toInt, rounds = 2, docSampleBits = bits)
            .collect().head
          s""""n_exact":${row.getLong(0)},"n_ivf":${row.getLong(1)},""" +
            s""""n_hits":${row.getLong(2)},"recall_ppm":${row.get(3)}"""
        }
        run() // warm-up: JIT + file listing, discarded
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        val payload = run()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"audit":"ivf-recall","sf":"$sfDir","cos2":"$num/$den","k":${k.toInt},"bits":$bits,$payload,"wall_sec":$secs%.2f}""")
      case "time" :: name :: sfDir :: rest =>
        val runs = rest.headOption.map(_.toInt).getOrElse(3)
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm-up, discarded
        val times = (1 to runs).map { _ =>
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"""{"audit":"time","query":"$name","sf":"$sfDir","runs":$runs,"median_sec":${times(times.length / 2)}%.3f,"min":${times.head}%.3f,"max":${times.last}%.3f}""")
      case other =>
        System.err.println(s"Audit: unknown args ${other.mkString(" ")}")
        sys.exit(2)
    }
    spark.stop()
  }
}
