package graft.jobs

import graft.GraftSession

/** CLI stage dispatcher (SURVEY.md §2 #22; reference
  * `les_main.py:54-202`). Stage name → job, invalid stage → error,
  * mirroring the reference's argparse surface on local paths:
  *
  * {{{
  * runMain graft.jobs.Main --stage-name bronze_asset \
  *   --raw-dir /data/raw/DEAL1 --lake-root /data/lake \
  *   --ed-code DEAL1 --file-key Loan_Data --ingestion-date 2023-07-31
  * }}}
  */
object Main {

  sealed trait Stage { def name: String }
  case object BronzeAsset extends Stage { val name = "bronze_asset" }
  case object BronzeBondInfo extends Stage { val name = "bronze_bond_info" }
  case object BronzeAmortisation extends Stage { val name = "bronze_amortisation" }
  case object BronzeDealDetails extends Stage { val name = "bronze_deal_details" }
  case object SilverAsset extends Stage { val name = "silver_asset" }
  case object SilverBondInfo extends Stage { val name = "silver_bond_info" }
  case object SilverDealDetails extends Stage { val name = "silver_deal_details" }
  /** Whole-lake runner: bronze for every deal under --raw-root with
    * bounded parallelism (default 20, the reference DAG's
    * max_active_tasks), then the silver stages once. */
  case object RunAll extends Stage { val name = "run_all" }

  val stages: Seq[Stage] = Seq(BronzeAsset, BronzeBondInfo, BronzeAmortisation,
    BronzeDealDetails, SilverAsset, SilverBondInfo, SilverDealDetails, RunAll)

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val spark = GraftSession.build(
      appName = s"graft-${opts.getOrElse("stage-name", "cli")}")
    try run(opts, spark) finally spark.stop()
  }

  /** Dispatcher body, session-injected for testability (the CLI main
    * owns session lifecycle; specs pass the shared test session). */
  def run(opts: Map[String, String],
          spark: org.apache.spark.sql.SparkSession): Unit = {
    def req(k: String): String =
      opts.getOrElse(k, sys.error(s"missing required --$k"))

    val stageName = req("stage-name")
    val stage = stages.find(_.name == stageName)
      .getOrElse(sys.error(
        s"invalid stage $stageName; expected one of ${stages.map(_.name).mkString(", ")}"))
    val lakeRoot = req("lake-root")
    stage match {
      case BronzeAsset =>
        Jobs.bronzeCsv(spark, req("raw-dir"), lakeRoot, "assets",
          req("ed-code"), opts.getOrElse("file-key", "Loan_Data"),
          req("ingestion-date"))
      case BronzeBondInfo =>
        Jobs.bronzeCsv(spark, req("raw-dir"), lakeRoot, "bond_info",
          req("ed-code"), opts.getOrElse("file-key", "Bond_Info"),
          req("ingestion-date"))
      case BronzeAmortisation =>
        // same bronze path; the reference truncates these tapes to 121
        // columns and has no PK entry (degraded checksum — see CleanCsv)
        Jobs.bronzeCsv(spark, req("raw-dir"), lakeRoot, "amortisation",
          req("ed-code"), opts.getOrElse("file-key", "Amortisation"),
          req("ingestion-date"))
      case BronzeDealDetails =>
        Jobs.bronzeDealDetails(spark, req("raw-dir"), lakeRoot,
          opts.getOrElse("file-key", "Deal_Details"))
      case RunAll =>
        Jobs.runAllDeals(spark, req("raw-root"), lakeRoot,
          req("ingestion-date"),
          opts.getOrElse("parallelism", "20").toInt)
      case SilverAsset => Jobs.silverTopicSplit(spark, lakeRoot, "assets")
      case SilverBondInfo => Jobs.silverTopicSplit(spark, lakeRoot, "bond_info")
      case SilverDealDetails => Jobs.silverDealDetails(spark, lakeRoot)
    }
  }
}
