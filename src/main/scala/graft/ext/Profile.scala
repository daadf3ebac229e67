package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric data profiling.
  *
  * Equi-width histograms are the one-pass profile every ingest
  * pipeline wants before choosing filters/clipping bounds. Shape:
  * a 1-row (min, max) aggregate broadcast back over the scan, then a
  * map-combined bin count — two scans, no sort, no shuffle of data
  * rows. Bin assignment is a fixed dag of IEEE double ops (no
  * accumulation), so bins are engine-exact for any input.
  */
object Profile {

  /** (bin, n) for `bins` equal-width buckets of column `c` between
    * its min and max; the max value lands in the last bin. Degenerate
    * single-value columns collapse to bin 0. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val bounds = df.agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
    df.select(col(c).as("x")).filter(col("x").isNotNull)
      .join(broadcast(bounds))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(
          floor((col("x") - col("lo")) * bins / (col("hi") - col("lo")))
            .cast("long"),
          lit(bins - 1L))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }
}
