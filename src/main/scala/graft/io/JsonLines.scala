package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink + fixed-shard layout — the interchange
  * format of training-data pipelines (one JSON object per line,
  * gzip-friendly, streamable). Spark's json source IS jsonl: one
  * object per line unless `multiLine` is set, so both directions are
  * plain declarative reads/writes that scale with the file split.
  *
  * Shard layout: a training corpus is conventionally delivered as N
  * equal-ish files (`shard-00000.jsonl …`) so downstream loaders can
  * stripe workers across files. [[writeSharded]] derives the shard
  * from a HASH of a caller-named key — deterministic across retries
  * and re-runs (unlike round-robin `repartition(n)`, whose assignment
  * depends on the incoming partitioning), and balanced to ~1/n by
  * hash uniformity.
  */
object JsonLines {

  /** Read a jsonl directory/file. Pass the schema when you have one —
    * schema inference is a full extra pass over the data (twice the
    * scan at 100 TB); with an explicit schema the read is single-pass
    * and malformed lines land in `_corrupt_record`-free PERMISSIVE
    * nulls rather than failing the job. */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.json(path)
  }

  /** Plain jsonl write (one part file per task partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Write exactly `n` jsonl shards (`shard=0 … shard=n-1` dirs),
    * sharded by hash of `key`: shard i holds every row with
    * pmod(xxhash64(key), n) == i, so any engine can re-derive the
    * row→shard mapping, and a re-run lands rows in identical shards —
    * what makes resumable bulk exports safe (round-robin
    * `repartition(n)` assignment depends on incoming partitioning).
    * One shuffle co-locates each shard before the write, so each
    * shard directory is a single file; hash uniformity balances
    * shards to ~1/n. */
  def writeSharded(df: DataFrame, path: String, key: String, n: Int): Unit = {
    require(n > 0, "shard count must be positive")
    df.withColumn("shard", pmod(xxhash64(col(key)), lit(n.toLong)))
      .repartition(n, col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(path)
  }
}
