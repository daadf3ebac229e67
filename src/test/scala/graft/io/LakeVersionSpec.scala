package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import graft.TestSpark

/** Versioned-lake protocol coverage: snapshot isolation, time travel,
  * the rename-CAS commit race, crash-orphan invisibility, and vacuum's
  * checkpoint fold. */
class LakeVersionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/table"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  private def df(vals: Long*) = vals.toDF("id")

  test("append commits accumulate; every version stays readable") {
    val root = freshRoot("vlake")
    assert(VersionedLake.commit(df(1L, 2L), root) == 1L)
    assert(VersionedLake.commit(df(3L), root) == 2L)
    assert(ids(VersionedLake.read(spark, root)) == Set(1L, 2L, 3L))
    assert(ids(VersionedLake.read(spark, root, Some(1L))) == Set(1L, 2L))
    assert(VersionedLake.currentVersion(spark, root) == 2L)
  }

  test("overwrite replaces the snapshot but not history") {
    val root = freshRoot("vlake")
    VersionedLake.commit(df(1L, 2L), root)
    VersionedLake.commit(df(3L), root)
    val v3 = VersionedLake.commit(df(9L), root, overwrite = true)
    assert(v3 == 3L)
    assert(ids(VersionedLake.read(spark, root)) == Set(9L))
    assert(ids(VersionedLake.read(spark, root, Some(2L))) == Set(1L, 2L, 3L))
    // the overwrite manifest records the prior live set as removes
    val h = VersionedLake.history(spark, root)
    assert(h.map(_.version) == Seq(1L, 2L, 3L))
    assert(h.last.removes.toSet ==
      VersionedLake.liveFiles(spark, root, Some(2L)).toSet)
  }

  test("a crashed commit's data dir is invisible until vacuumed") {
    val root = freshRoot("vlake")
    VersionedLake.commit(df(1L), root)
    // simulate a writer that died after staging data, before manifest
    df(99L).write.parquet(s"$root/data/orphan-uuid")
    assert(ids(VersionedLake.read(spark, root)) == Set(1L))
    val (dropped, _) = VersionedLake.vacuum(spark, root, retainFrom = 1L)
    assert(dropped.exists(_.startsWith("data/orphan-uuid/")))
    assert(ids(VersionedLake.read(spark, root)) == Set(1L))
  }

  test("version-name collision retries as the next version (rename CAS)") {
    val root = freshRoot("vlake")
    VersionedLake.commit(df(1L), root)
    // occupy version 2's name, as a concurrent winner would
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new Path(root, "_vlog")
    val winner = new Path(log, f"${2L}%020d.mf")
    val out = fs.create(winner, false)
    out.write("version\t2\n".getBytes("UTF-8")); out.close()
    val v = VersionedLake.commit(df(5L), root)
    assert(v == 3L) // lost the race at 2, landed at 3
    assert(ids(VersionedLake.read(spark, root)) == Set(1L, 5L))
  }

  test("vacuum folds a checkpoint: horizon readable, past gone, files swept") {
    val root = freshRoot("vlake")
    VersionedLake.commit(df(1L), root)              // v1
    VersionedLake.commit(df(2L), root)              // v2
    VersionedLake.commit(df(7L), root, overwrite = true) // v3: drops v1+v2 files
    VersionedLake.commit(df(8L), root)              // v4
    val before = VersionedLake.liveFiles(spark, root, Some(3L))
    val (dropped, droppedVersions) = VersionedLake.vacuum(spark, root, 3L)
    assert(droppedVersions == Seq(1L, 2L))
    assert(dropped.nonEmpty) // v1/v2 data files survive no retained snapshot
    // retained horizon still time-travels exactly
    assert(ids(VersionedLake.read(spark, root, Some(3L))) == Set(7L))
    assert(ids(VersionedLake.read(spark, root)) == Set(7L, 8L))
    assert(VersionedLake.liveFiles(spark, root, Some(3L)) == before)
    // the horizon manifest is now a self-contained checkpoint
    val h = VersionedLake.history(spark, root)
    assert(h.map(_.version) == Seq(3L, 4L))
    assert(h.head.removes.isEmpty && h.head.adds == before)
    // pre-horizon versions are gone
    intercept[IllegalArgumentException] {
      VersionedLake.read(spark, root, Some(2L))
    }
  }

  test("empty table reads empty; version 0 is the empty snapshot") {
    val root = freshRoot("vlake")
    assert(VersionedLake.currentVersion(spark, root) == 0L)
    assert(VersionedLake.read(spark, root).isEmpty)
  }
}
