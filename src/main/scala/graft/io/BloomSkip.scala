package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary-key Bloom sidecars for a sharded parquet table —
  * point-lookup file skipping without a table format.
  *
  * Hash-sharding a table by its primary key ([[JsonLines.writeSharded]])
  * already makes primary-key lookups touch one shard, but a lookup by
  * any OTHER column still scans every shard. The standard lake answer
  * is a per-file Bloom filter over the secondary column (Parquet
  * bloom filters / Delta file stats do the same job): at write time
  * each shard records a small bitset summarizing its secondary-key
  * set; at read time a probe value's bit positions are checked
  * against every sidecar (driver-side, tiny) and only shards whose
  * filter MAY contain the value are read. Bloom semantics: never a
  * false negative (a containing shard is always read), false
  * positives only cost an extra shard scan — bounded by
  * (1 − e^(−h·k/m))^h for k distinct keys per shard.
  *
  * Scale shape: the bitset is built distributively as (shard, word)
  * bit-OR aggregates — the shuffle carries at most shards × m/64
  * longs (256 per shard at the default 16 KiB filter), never the key
  * stream; the driver materializes only the finished bitmaps. The
  * probe path reads sidecar files only — no Spark job at all until
  * the pruned scan itself.
  *
  * Bit positions come from md5 (h salted draws), computed with the
  * SAME formula as a Spark `Column` at write time and as driver-side
  * Scala at probe time — `conv(substring(md5(i:value),1,15),16,10)
  * % m` — so writer and prober agree bit-for-bit (md5 hex is
  * identical everywhere; 15 hex chars < 2⁶⁰ fit a long exactly).
  */
object BloomSkip {

  val DefaultBits = 1 << 17 // m = 131072 bits → 16 KiB sidecar payload
  val DefaultHashes = 5

  private def bloomDir(path: String) = s"$path/_bloom"

  /** The i-th salted bit position of `value`, as a Column (write side). */
  private def posCol(value: org.apache.spark.sql.Column, i: Int, m: Int) =
    (conv(substring(md5(concat(lit(s"$i:"), value).cast("binary")), 1, 15),
      16, 10).cast("long") % m).cast("int")

  /** The same position, driver-side (probe side). */
  private[io] def posDriver(value: String, i: Int, m: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$value".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % m).toInt
  }

  /** Write `df` hash-sharded by `primary` into `shard=<i>/` parquet
    * dirs (xxhash64 pmod n — [[JsonLines.writeSharded]]'s resumable
    * convention), and a Bloom sidecar per shard over `secondary`.
    * NULL secondaries set no bits (equality never matches NULL). */
  def writeSharded(df: DataFrame, path: String, primary: String,
                   secondary: String, shards: Int,
                   m: Int = DefaultBits, h: Int = DefaultHashes): Unit = {
    require(shards > 0 && m >= 64 && m % 64 == 0 && h >= 1,
      "need shards > 0, m a positive multiple of 64, h >= 1")
    val sharded = df.withColumn("shard",
      pmod(xxhash64(col(primary)), lit(shards.toLong)).cast("int"))
    sharded.repartition(shards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // distributive bitset build: bit positions → (word, mask) → bit_or.
    // Source the build from the FILES JUST WRITTEN, not the `sharded`
    // lineage — re-evaluating a non-deterministic input plan (sample,
    // shuffle-order ids) a second time could produce sidecars that
    // disagree with the data on disk, silently voiding the
    // no-false-negative guarantee scanSecondary relies on
    val spark = df.sparkSession
    val written = spark.read.option("basePath", path).parquet(path)
    val sec = written.select(col("shard"),
        col(secondary).cast("string").as("v"))
      .filter(col("v").isNotNull)
    val words = sec
      .select(col("shard"),
        explode(array((0 until h).map(i => posCol(col("v"), i, m)): _*))
          .as("pos"))
      .select(col("shard"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("mask"))
      .groupBy("shard", "word").agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byShard = words.groupBy(_.getInt(0))
    (0 until shards).foreach { s =>
      val arr = new Array[Long](m / 64)
      byShard.getOrElse(s, Array.empty).foreach { r =>
        arr(r.getInt(1)) |= r.getLong(2)
      }
      val payload = new StringBuilder
      payload.append(s"""{"m":$m,"h":$h,"words":[""")
      payload.append(arr.mkString(","))
      payload.append("]}")
      val out = fs.create(new Path(bloomDir(path), s"shard-$s.json"), true)
      try out.write(payload.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Shards whose Bloom filter MAY contain `value` — the prune
    * decision, driver-side from sidecars only (no Spark job). Shards
    * without a sidecar are conservatively kept. */
  def candidateShards(spark: SparkSession, path: String, value: String)
      : Seq[Int] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shardDirs = fs.listStatus(new Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .map(_.getPath.getName.stripPrefix("shard=").toInt)
      .sorted
    shardDirs.filter { s =>
      val side = new Path(bloomDir(path), s"shard-$s.json")
      if (!fs.exists(side)) true
      else {
        val in = fs.open(side)
        val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val m = """"m":(\d+)""".r.findFirstMatchIn(raw).get.group(1).toInt
        val h = """"h":(\d+)""".r.findFirstMatchIn(raw).get.group(1).toInt
        val words = raw.substring(raw.indexOf('[') + 1, raw.lastIndexOf(']'))
          .split(',').map(_.trim.toLong)
        (0 until h).forall { i =>
          val p = posDriver(value, i, m)
          (words(p / 64) & (1L << (p % 64))) != 0L
        }
      }
    }.toSeq
  }

  /** Point lookup on the secondary column: read ONLY the candidate
    * shards, then apply the exact equality filter. Returns an empty
    * frame (correct schema) when every shard is pruned. */
  def scanSecondary(spark: SparkSession, path: String, secondary: String,
                    value: String): DataFrame = {
    val cands = candidateShards(spark, path, value)
    val full = spark.read.option("basePath", path).parquet(path)
    if (cands.isEmpty) full.limit(0)
    else spark.read.option("basePath", path)
      .parquet(cands.map(s => s"$path/shard=$s"): _*)
      .filter(col(secondary).cast("string") === value)
  }
}
