package graft.jobs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GoldRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSilver(root: String, rows: Seq[(String, String, String, String, String)]): Unit = {
    // (part, AL1, AL2, AL15 country, AL56 principal)
    rows.toDF("part", "AL1", "AL2", "AL15", "AL56")
      .withColumn("ed_code", split($"part", "_").getItem(0))
      .write.partitionBy("part").mode("overwrite")
      .parquet(s"$root/silver/assets/lease_info")
    rows.toDF("part", "AL1", "AL2", "AL15", "AL56")
      .withColumn("ed_code", split($"part", "_").getItem(0))
      .write.partitionBy("part").mode("overwrite")
      .parquet(s"$root/silver/assets/lease_features")
  }

  test("partition-scoped rollup refresh equals the full recompute") {
    val root = java.nio.file.Files.createTempDirectory("gold").toString
    val rollup = s"$root/gold/principal_rollup"
    val d1 = Seq(
      ("D1_20230731", "l1", "p1", "it", "100.00"),
      ("D1_20230731", "l2", "p1", "de", "50.00"))
    val d2 = Seq(
      ("D2_20230731", "l3", "p2", "it", "25.00"))
    writeSilver(root, d1 ++ d2)
    // initial build: all partitions
    Gold.refreshPrincipalRollup(spark, root, rollup,
      Seq("D1_20230731", "D2_20230731"))
    val full = Gold.principalByCountry(spark, root).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val served = Gold.principalByCountryFromRollup(spark, rollup).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(served == full)
    assert(served == Set(("de", 50.0, 1L), ("it", 125.0, 2L)))

    // deal D1 re-ingested with corrected principal: refresh ONLY D1
    writeSilver(root, Seq(
      ("D1_20230731", "l1", "p1", "it", "200.00"),
      ("D1_20230731", "l2", "p1", "de", "50.00")) ++ d2)
    Gold.refreshPrincipalRollup(spark, root, rollup, Seq("D1_20230731"))
    val after = Gold.principalByCountryFromRollup(spark, rollup).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(after == Set(("de", 50.0, 1L), ("it", 225.0, 2L)))
    // incremental == full recompute
    val direct = Gold.principalByCountry(spark, root).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(after == direct)
  }

  test("refresh works regardless of session overwrite mode; zero-row part drops its slice") {
    val root = java.nio.file.Files.createTempDirectory("gold0").toString
    val rollup = s"$root/gold/principal_rollup"
    writeSilver(root, Seq(
      ("D1_20230731", "l1", "p1", "it", "100.00"),
      ("D2_20230731", "l3", "p2", "de", "25.00")))
    // a caller session with STATIC overwrite must not truncate other
    // partitions (the write path is conf-independent by construction)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      Gold.refreshPrincipalRollup(spark, root, rollup,
        Seq("D1_20230731", "D2_20230731"))
      Gold.refreshPrincipalRollup(spark, root, rollup, Seq("D1_20230731"))
      val served = Gold.principalByCountryFromRollup(spark, rollup).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(served == Set(("it", 100.0), ("de", 25.0))) // D2 intact
      // D1's silver slice now refreshes to zero rows -> its rollup
      // slice must disappear, not serve the stale partial
      writeSilver(root, Seq(("D2_20230731", "l3", "p2", "de", "25.00")))
      Gold.refreshPrincipalRollup(spark, root, rollup, Seq("D1_20230731"))
      val drained = Gold.principalByCountryFromRollup(spark, rollup).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(drained == Set(("de", 25.0)))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }
}
