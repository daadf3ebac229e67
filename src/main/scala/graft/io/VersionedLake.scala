package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.collection.mutable

/** Versioned lake: snapshot isolation + time travel on plain parquet,
  * the transaction-log protocol the reference got from Delta
  * (`generate_bronze_tables.py:81-86` writes bronze as Delta; this env
  * has no Delta jar — SURVEY §7.4) rebuilt from first principles on
  * the Hadoop FileSystem contract.
  *
  * Layout:
  * {{{
  *   root/_vlog/00000000000000000001.mf   one manifest per commit
  *   root/data/<uuid>/part-*.parquet      immutable data files
  * }}}
  *
  * Protocol (Delta's, minus the encoding):
  *   - a commit FIRST writes its data files into a private
  *     `data/<uuid>` dir — invisible until referenced;
  *   - then appends a manifest (`version`, `adds`, `removes` as
  *     data-relative paths) via write-to-temp + rename to the next
  *     version's reserved name. Hadoop rename-to-existing returns
  *     false, which makes the rename a compare-and-swap: concurrent
  *     writers race on the same version number and exactly one wins;
  *     the loser re-reads the log and retries at the next number.
  *   - readers resolve a snapshot by replaying manifests 1..v
  *     (live = adds − later removes) and read exactly those files —
  *     a crashed writer's orphan data dir is unreferenced and
  *     therefore invisible. No reader ever sees a half-commit.
  *
  * At 100 TB the log stays cheap: manifests carry file PATHS (not
  * data), appends list only their own files, and [[vacuum]] folds the
  * retained horizon into a checkpoint manifest so replay length is
  * bounded by the retention window, not table age. The natural next
  * extension (not needed for parity) is Iceberg-style per-file
  * partition/stat columns in the manifest for manifest-level pruning.
  */
object VersionedLake {

  private val LogDir = "_vlog"
  private val DataDir = "data"
  private val Ext = ".mf"

  /** One log entry, replayed in version order. */
  final case class Manifest(version: Long, adds: Seq[String],
                            removes: Seq[String])

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long) = f"$v%020d$Ext"

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log)
      .filter(s => s.isFile && s.getPath.getName.endsWith(Ext))
      .map(_.getPath.getName.stripSuffix(Ext).toLong)
      .toSeq.sorted
  }

  /** Latest committed version; 0 for an empty/absent table. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val (fs, rootPath) = fsOf(spark, root)
    listVersions(fs, rootPath).lastOption.getOrElse(0L)
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Manifest = {
    val in = fs.open(new Path(new Path(root, LogDir), manifestName(v)))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    val adds = mutable.ArrayBuffer[String]()
    val removes = mutable.ArrayBuffer[String]()
    lines.foreach { l =>
      l.split('\t') match {
        case Array("add", p)    => adds += p
        case Array("remove", p) => removes += p
        case Array("version", _) | Array("") => ()
        case other => throw new java.io.IOException(
          s"corrupt manifest $v: ${other.mkString("\t")}")
      }
    }
    Manifest(v, adds.toSeq, removes.toSeq)
  }

  private def writeManifestTmp(fs: FileSystem, root: Path, m: Manifest): Path = {
    val log = new Path(root, LogDir)
    fs.mkdirs(log)
    val tmp = new Path(log, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    val w = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"))
    try {
      w.println(s"version\t${m.version}")
      m.adds.foreach(p => w.println(s"add\t$p"))
      m.removes.foreach(p => w.println(s"remove\t$p"))
    } finally w.close()
    tmp
  }

  /** Data-relative live file paths at `version` (latest when None). */
  def liveFiles(spark: SparkSession, root: String,
                version: Option[Long] = None): Seq[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    val versions = listVersions(fs, rootPath)
    val upTo = version.getOrElse(versions.lastOption.getOrElse(0L))
    require(versions.contains(upTo) || (upTo == 0 && versions.isEmpty),
      s"version $upTo does not exist (log has ${versions.mkString(",")})")
    val live = mutable.LinkedHashSet[String]()
    versions.takeWhile(_ <= upTo).foreach { v =>
      val m = readManifest(fs, rootPath, v)
      m.removes.foreach(live -= _)
      m.adds.foreach(live += _)
    }
    live.toSeq
  }

  /** Snapshot read at `version` (latest when None). Returns an empty
    * frame (no columns) for an empty table. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val files = liveFiles(spark, root, version)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Commit `df` as the next version. `overwrite = false` appends;
    * `true` replaces the whole table (the previous snapshot's files
    * are listed as removes — still readable via time travel until
    * [[vacuum]]). Returns the committed version. Optimistic
    * concurrency: on a version-name collision the commit re-reads the
    * log and retries (fresh removes under overwrite), up to
    * `maxAttempts`. */
  def commit(df: DataFrame, root: String, overwrite: Boolean = false,
             maxAttempts: Int = 20): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    val uuid = java.util.UUID.randomUUID().toString
    val stage = new Path(new Path(rootPath, DataDir), uuid)
    df.write.mode("overwrite").parquet(stage.toString)
    fs.delete(new Path(stage, "_SUCCESS"), false)
    val adds = fs.listStatus(stage)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$DataDir/$uuid/${s.getPath.getName}").toSeq.sorted
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val v = currentVersion(spark, root) + 1
      val removes =
        if (overwrite && v > 1) liveFiles(spark, root, Some(v - 1))
        else Seq.empty
      val tmp = writeManifestTmp(fs, rootPath, Manifest(v, adds, removes))
      val dst = new Path(new Path(rootPath, LogDir), manifestName(v))
      // rename-to-existing returns false → another writer owns v; retry
      if (fs.rename(tmp, dst)) return v
      fs.delete(tmp, false)
    }
    fs.delete(stage, true) // never referenced — safe to drop
    throw new java.io.IOException(
      s"commit lost the version race $maxAttempts times: $root")
  }

  /** Per-version commit summary (adds/removes counts), oldest first. */
  def history(spark: SparkSession, root: String): Seq[Manifest] = {
    val (fs, rootPath) = fsOf(spark, root)
    listVersions(fs, rootPath).map(readManifest(fs, rootPath, _))
  }

  /** Retention: keep time travel for versions ≥ `retainFrom`, drop
    * everything older.
    *
    *  1. version `retainFrom`'s manifest is rewritten as a CHECKPOINT
    *     (full live-set adds, no removes) via the park-aside/rename-in
    *     swap, so the remaining log is self-contained;
    *  2. manifests < `retainFrom` are deleted;
    *  3. data files referenced by NO surviving snapshot — including
    *     orphans from crashed commits — are deleted, and emptied
    *     `data/<uuid>` dirs are swept.
    *
    * Returns (deleted files, deleted manifest versions). Maintenance
    * op like [[Lake.compact]]: not concurrent with writers. */
  def vacuum(spark: SparkSession, root: String,
             retainFrom: Long): (Seq[String], Seq[Long]) = {
    val (fs, rootPath) = fsOf(spark, root)
    val versions = listVersions(fs, rootPath)
    require(versions.contains(retainFrom),
      s"retainFrom $retainFrom is not a committed version")
    val retained = versions.filter(_ >= retainFrom)
    val keep = retained.flatMap(v => liveFiles(spark, root, Some(v))).toSet
    // checkpoint the horizon version so replay no longer needs its past
    val checkpoint = Manifest(retainFrom,
      liveFiles(spark, root, Some(retainFrom)), Seq.empty)
    val log = new Path(rootPath, LogDir)
    val dst = new Path(log, manifestName(retainFrom))
    val aside = new Path(log, s".aside-${manifestName(retainFrom)}")
    val tmp = writeManifestTmp(fs, rootPath, checkpoint)
    fs.delete(aside, false)
    if (!fs.rename(dst, aside) || !fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"checkpoint swap failed at $retainFrom (old manifest in $aside)")
    fs.delete(aside, false)
    val droppedVersions = versions.filter(_ < retainFrom)
    droppedVersions.foreach(v => fs.delete(new Path(log, manifestName(v)), false))
    // sweep unreferenced data files (removed-pre-horizon + crash orphans)
    val dataRoot = new Path(rootPath, DataDir)
    val dropped = mutable.ArrayBuffer[String]()
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).filter(_.isDirectory).foreach { d =>
        fs.listStatus(d.getPath).filter(_.isFile).foreach { f =>
          val rel = s"$DataDir/${d.getPath.getName}/${f.getPath.getName}"
          if (!keep.contains(rel)) { fs.delete(f.getPath, false); dropped += rel }
        }
        if (fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, true)
      }
    }
    (dropped.toSeq.sorted, droppedVersions)
  }
}
