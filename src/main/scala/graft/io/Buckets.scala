package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for repeated co-located joins.
  *
  * A fact table joined on the same key by many downstream jobs pays
  * one shuffle PER JOIN unless the layout carries the partitioning.
  * Hash-bucketing both sides on the join key (same bucket count)
  * persists an `HashPartitioning`-compatible layout in the catalog, so
  * Catalyst plans SortMergeJoin with ZERO Exchange on either side —
  * the shuffle is paid once at write time, then amortized over every
  * subsequent join/aggregation on that key (the same economics as the
  * reference's per-deal partition layout, but for high-cardinality
  * keys).
  *
  * `sortBy` within buckets additionally lets the join skip its sort
  * stage and lines the data up for min/max row-group skipping. Bucket
  * count is a layout contract: both join sides must agree (or be a
  * multiple — Spark 3.1+ coalesces compatible counts).
  */
object Buckets {

  /** Persist `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
