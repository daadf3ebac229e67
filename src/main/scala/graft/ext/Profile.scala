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

  /** Whole-table column profile: one row per requested column with
    * row count, null count, EXACT distinct count, and min/max (as
    * strings, so one schema fits every column type). The profile every
    * warehouse runs after ingest — feeds null-rate alerts, key
    * candidate discovery, and partition-bound planning.
    *
    * Plan shape: ONE aggregation pass; the multiple COUNT(DISTINCT)s
    * plan as Catalyst's Expand (one shuffle carrying N streams), which
    * is the exact-distinct cost at any scale — swap in
    * approx_count_distinct when estimates suffice (see [[Hll]]). The
    * 1-row result pivots to rows in-row (explode of a literal-built
    * array), never a second pass. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns must exist: ${cols.filterNot(df.columns.contains).mkString(",")}")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      min(col(c).cast("string")).as(s"__min_$c"),
      max(col(c).cast("string")).as(s"__max_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))): _*)).as("s"))
      .select("s.*")
  }

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
