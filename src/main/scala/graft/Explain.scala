package graft

/** Plan-audit utility: print the formatted physical plan of named
  * SparkEntry queries (all queries if no names given).
  *
  *   sbt "runMain graft.Explain x35_fuzzy_blocked_join q03_join_revenue_by_nation"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01 testdata).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build(appName = "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
