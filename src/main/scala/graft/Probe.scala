package graft

import org.apache.spark.sql.functions._

/** Throwaway cost-decomposition probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.build(appName = "graft-probe")
    import s.implicits._
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-28s ${ts(1)}%.3f s")
    }
    val li = graft.tables.t(s, d, "lineitem")
    time("p05-scan-count") { li.count() }
    val base = li.select(
      $"l_returnflag".as("flag_s"),
      $"l_quantity".cast("string").as("qty_s"),
      to_date($"l_shipdate").cast("string").as("ship_s"))
    time("p05-base-strings") { base.count() }
    import graft.quality.Rules
    import graft.quality.Rules._
    val schema = Map(
      "flag_s" -> ColumnRule(TString, allowed = Some(Seq("A", "N"))),
      "qty_s" -> ColumnRule(TNumber, coerce = true),
      "ship_s" -> ColumnRule(TDatetime, coerce = true,
        minDate = Some("1994-01-01"), maxDate = Some("1998-06-30")))
    val failedCols = concat_ws(",",
      schema.toSeq.sortBy(_._1).map { case (n, r) =>
        when(Rules.errorFor(n, r).isNotNull, lit(n)) }: _*)
    time("p05-rules-nogroup") {
      base.withColumn("failed_cols", failedCols).count()
    }
    time("p05-full") {
      base.withColumn("failed_cols", failedCols)
        .withColumn("valid", $"failed_cols" === "")
        .groupBy($"valid", $"failed_cols")
        .agg(count(lit(1)).as("n")).count()
    }
    // rules WITHOUT the date path
    val failedNoDate = concat_ws(",",
      schema.toSeq.sortBy(_._1).filter(_._1 != "ship_s").map { case (n, r) =>
        when(Rules.errorFor(n, r).isNotNull, lit(n)) }: _*)
    time("p05-rules-nodate") {
      base.withColumn("failed_cols", failedNoDate).count()
    }
    // date path only
    time("p05-dateonly") {
      base.select(Rules.multiFormatDate($"ship_s").as("dd"))
        .filter($"dd".isNotNull).count()
    }
    // qty cast only
    time("p05-qtyonly") {
      base.filter($"qty_s".cast("double").isNotNull).count()
    }
    // x14 decomposition (ivfTopKInt8: checkpoint + Lloyd + probe + score)
    val emb = graft.tables.t(s, d, "embeddings")
    time("x14-emb-count") { emb.count() }
    import graft.ext.Similarity
    time("x14-quant-checkpoint") {
      emb.select($"vec_id".as("vid"), $"embedding".as("cv"),
          Similarity.int8Quantize($"embedding").getField("q").as("q8"))
        .localCheckpoint().count()
    }
    time("x14-full") {
      Similarity.ivfTopKInt8(emb.filter($"vec_id" < 5), "vec_id", "embedding",
        emb, "vec_id", "embedding",
        k = 10, nCentroids = 16, nProbe = 6, rounds = 2).count()
    }
    s.stop()
  }
}
