package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.schema.Layout

/** Partitioned-parquet lake layer (SURVEY.md §2 #3/#4/#8/#10/#11/#12).
  *
  * The reference's tables are Delta directories on GCS partitioned by
  * the single string column `part={ed_code}_{yyyyMMdd}`; this env has
  * no Delta jar (SURVEY §7.4), so bronze+silver are plain parquet with
  * `partitionOverwriteMode=dynamic` providing the partition-scoped
  * overwrite the reference got from Delta.
  *
  * The reference probes partition existence by listing GCS blobs
  * before reading (`bronze_funcs.py:36-59`); with a file-source table
  * Catalyst's partition pruning subsumes that — we keep only a cheap
  * FS existence check to preserve the "first write wins" /
  * initial-vs-upsert branching.
  */
object Lake {

  def partValue(edCode: String, pcd: String): String =
    s"${edCode}_${pcd.replace("-", "")}"

  def partitionExists(spark: SparkSession, root: String, part: String): Boolean = {
    val p = new Path(s"$root/part=$part")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  def tableExists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Pruned scan of one `(ed_code, pcd)` partition; None when absent
    * (reference `get_old_table`, `bronze_funcs.py:36-59` — minus its
    * unquoted-predicate bug, SURVEY §7.5.2). */
  def readPartition(spark: SparkSession, root: String, edCode: String, pcd: String)
      : Option[DataFrame] = {
    val part = partValue(edCode, pcd)
    if (partitionExists(spark, root, part))
      Some(spark.read.parquet(root).where(col("part") === part))
    else None
  }

  /** Dynamic partition overwrite: replaces only the partitions present
    * in `df` (reference write shape, `generate_bronze_tables.py:81-86`). */
  def writePartitioned(df: DataFrame, root: String): Unit =
    df.write.partitionBy("part").mode("overwrite").parquet(root)

  /** Current-version scan (`generate_asset_silver.py:77-83`): one
    * partition, iscurrent==1, bookkeeping columns dropped. */
  def currentScan(spark: SparkSession, root: String, edCode: String, pcd: String)
      : Option[DataFrame] =
    readPartition(spark, root, edCode, pcd)
      .map(_.filter(col("iscurrent") === 1).drop(Layout.scd2Cols: _*))

  /** Whole-table current scan (deal_details silver,
    * `generate_deal_details_silver.py:89-94`). */
  def currentScanAll(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root).filter(col("iscurrent") === 1)
      .drop(Layout.scd2Cols: _*)

  // ---- idempotency ledger (#3/#10/#11) ------------------------------

  /** Ledger marker path: clean_dump/{dataType}/{date}_{ed_code}.csv. */
  private def ledgerDir(root: String, dataType: String) =
    s"$root/clean_dump/$dataType"

  /** True when this ingestion date already has a clean dump FOR THIS
    * DEAL — job-level idempotency (`bronze_funcs.py:167-184`). Scoped
    * per ed_code (the ledger file is `{date}_{ed_code}.csv`): a
    * date-global probe would make deal B skip its load the moment
    * deal A finished, which breaks the 20-wide per-deal fan-out. */
  def cleanDumpExists(spark: SparkSession, root: String, dataType: String,
                      ingestionDate: String, edCode: String): Boolean = {
    val f = new Path(ledgerDir(root, dataType), s"${ingestionDate}_$edCode.csv")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(f)
  }

  /** Write the per-deal ledger of cleanly loaded (ed_code, pcd) pairs
    * (`generate_bronze_tables.py:91-97`). Tiny by construction →
    * driver-side single-file write. */
  def writeLedger(spark: SparkSession, root: String, dataType: String,
                  ingestionDate: String, edCode: String,
                  rows: Seq[(String, String)]): Unit = {
    val dir = new Path(ledgerDir(root, dataType))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, s"${ingestionDate}_$edCode.csv"), true)
    val w = new java.io.PrintWriter(out)
    try {
      w.println("ed_code,pcd")
      rows.foreach { case (e, p) => w.println(s"$e,$p") }
    } finally w.close()
  }

  /** Read all ledgers for a data type → (ed_code, pcd) work list
    * (`generate_asset_silver.py:65-75`). */
  def readLedgers(spark: SparkSession, root: String, dataType: String)
      : Seq[(String, String)] = {
    val dir = ledgerDir(root, dataType)
    if (!tableExists(spark, dir)) Seq.empty
    else spark.read.option("header", "true").csv(dir)
      .select("ed_code", "pcd").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** One partition's compaction outcome. */
  final case class CompactStat(part: String, filesBefore: Int, filesAfter: Int)

  /** Small-file compaction (the OPTIMIZE of a plain-parquet lake).
    *
    * Streaming/incremental writers leave `part=` directories with many
    * sub-target files; at 100 TB that means listing and opening
    * millions of tiny footers per scan. For each partition whose file
    * count exceeds `maxFiles`, rewrite it into
    * ceil(bytes / targetBytes) files via write-to-temp + directory
    * swap — the swap is FS-level, so the table never has a partially
    * compacted partition visible, and readers of OTHER partitions are
    * never touched. Partitions are processed independently (failure
    * leaves earlier swaps intact — compaction is idempotent and
    * re-runnable). */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024,
              maxFiles: Int = 1): Seq[CompactStat] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
    val stats = parts.toSeq.flatMap { p =>
      val files = fs.listStatus(p.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (files.length <= maxFiles) None
      else {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(rootPath, s".compact_tmp/${p.getPath.getName}")
        fs.delete(tmp, true)
        spark.read.parquet(p.getPath.toString)
          .repartition(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        // swap: the partition dir is replaced wholesale, never merged
        fs.delete(p.getPath, true)
        fs.rename(tmp, p.getPath)
        // drop Spark's _SUCCESS marker inside the partition dir
        fs.delete(new Path(p.getPath, "_SUCCESS"), false)
        Some(CompactStat(p.getPath.getName, files.length, nOut))
      }
    }
    fs.delete(new Path(rootPath, ".compact_tmp"), true)
    stats
  }

  /** One partition's file-level stats. */
  final case class PartitionStat(part: String, files: Int, bytes: Long)

  /** FS-level partition inventory (files + bytes per `part=` dir) —
    * the observability feed for [[compact]] (too many files?) and
    * [[vacuum]] (stale partitions?) decisions. Listing only; never
    * opens a file. */
  def partitionStats(spark: SparkSession, root: String): Seq[PartitionStat] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .map { p =>
        val files = fs.listStatus(p.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionStat(p.getPath.getName.stripPrefix("part="),
          files.length, files.map(_.getLen).sum)
      }.toSeq.sortBy(_.part)
  }

  /** Retention: delete every `part=` partition whose VALUE fails
    * `keep`. FS-level and partition-scoped (readers of kept partitions
    * never see a half-deleted table); returns the deleted partition
    * values. Pairs with [[compact]] as the lake's maintenance pair. */
  def vacuum(spark: SparkSession, root: String,
             keep: String => Boolean): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .map(_.getPath)
      .filter(p => !keep(p.getName.stripPrefix("part=")))
      .map { p => fs.delete(p, true); p.getName.stripPrefix("part=") }
      .toSeq
  }

  /** Reference-shaped bounded retry (`generate_bronze_tables.py:76-90`).
    * Unlike the reference we rethrow after the budget instead of
    * swallowing deterministic failures (SURVEY §7.5.4). */
  def retry[T](tries: Int = 5)(f: => T): T = {
    var last: Throwable = null
    (1 to tries).foreach { _ =>
      try return f
      catch { case e: Throwable => last = e }
    }
    throw last
  }
}
