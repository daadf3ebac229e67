package graft.jobs

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import graft.TestSpark

/** CLI dispatcher (#22): stage routing, required-arg errors, invalid
  * stage error — driven through Main.run with the shared session. */
class MainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeAssets(dir: String, deal: String): Unit = {
    val rows = Seq(
      "AL1,AL2,AL5,AL30",
      "Cut-off,Pool,Lease,Price",
      s"2023-07-31,P1,L1,10.50",
    ).mkString("\n")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, s"${deal}_2023_07_31_Loan_Data.csv"),
      rows.getBytes(StandardCharsets.UTF_8))
  }

  test("bronze_asset + silver_asset stages route and run") {
    val raw = Files.createTempDirectory("mainraw").toString
    val lake = Files.createTempDirectory("mainlake").toString
    writeAssets(raw, "DEALM")
    Main.run(Map(
      "stage-name" -> "bronze_asset", "raw-dir" -> raw,
      "lake-root" -> lake, "ed-code" -> "DEALM",
      "ingestion-date" -> "2023-07-31"), spark)
    Main.run(Map("stage-name" -> "silver_asset", "lake-root" -> lake), spark)
    assert(spark.read.parquet(s"$lake/silver/assets/lease_info").count() == 1)
  }

  test("run_all stage routes to the fan-out runner") {
    val rawRoot = Files.createTempDirectory("mainrawall").toString
    val lake = Files.createTempDirectory("mainlakeall").toString
    writeAssets(s"$rawRoot/DEALN", "DEALN")
    Main.run(Map(
      "stage-name" -> "run_all", "raw-root" -> rawRoot,
      "lake-root" -> lake, "ingestion-date" -> "2023-07-31",
      "parallelism" -> "2"), spark)
    assert(spark.read.parquet(s"$lake/silver/assets/lease_info").count() == 1)
  }

  test("invalid stage and missing args error clearly") {
    val e1 = intercept[RuntimeException] {
      Main.run(Map("stage-name" -> "nope", "lake-root" -> "/tmp"), spark)
    }
    assert(e1.getMessage.contains("invalid stage"))
    val e2 = intercept[RuntimeException] {
      Main.run(Map("stage-name" -> "bronze_asset", "lake-root" -> "/tmp"), spark)
    }
    assert(e2.getMessage.contains("missing required --raw-dir"))
  }
}
