package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift detection: which terms shifted between two corpora.
  *
  * Per-term chi-square contribution between the two term relative
  * frequencies: ((cA/tA − cB/tB)² ) / ((cA+cB)/(tA+tB)). Large values
  * flag vocabulary drift — the standard cheap monitor for "did this
  * month's crawl change distribution" before retraining decisions.
  *
  * Determinism: counts and totals are exact integers; each
  * contribution is a fixed dag of IEEE double ops (two divisions, one
  * multiply, one divide — no accumulation, so no float ordering), then
  * rounded to 9 dp. Identical in any engine. Scale: two map-combined
  * term counts + one full-outer join on term; totals ride in as a
  * 1-row broadcast.
  */
object Drift {

  private def counts(df: DataFrame, text: String, name: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as(name))

  private def round9(c: Column): Column = floor(c * 1e9 + 0.5) / 1e9

  /** (term, cnt_a, cnt_b, chi2) for every term in either corpus. */
  def termDrift(a: DataFrame, b: DataFrame, text: String): DataFrame = {
    val joined = counts(a, text, "cnt_a")
      .join(counts(b, text, "cnt_b"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = joined.agg(sum(col("cnt_a")).as("tot_a"),
      sum(col("cnt_b")).as("tot_b"))
    joined.join(broadcast(totals))
      .withColumn("_diff",
        col("cnt_a").cast("double") / col("tot_a") -
          col("cnt_b").cast("double") / col("tot_b"))
      .withColumn("_exp",
        (col("cnt_a") + col("cnt_b")).cast("double") /
          (col("tot_a") + col("tot_b")))
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        round9(col("_diff") * col("_diff") / col("_exp")).as("chi2"))
  }
}
