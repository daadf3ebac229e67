package graft

/** Plan inspection utility: prints the formatted physical plan of the
  * named queries (or all) against a testdata dir. Used to audit
  * pushdown / broadcast / codegen coverage per round.
  *
  * Usage: runMain graft.Explain <sfDir> [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build(appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"failed: $e") }
    }
    spark.stop()
  }
}
