package graft.scd2

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff labels inserted/deleted/changed; unchanged absent") {
    val old = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null, 40.0)
    ).toDF("k", "s", "v")
    val niu = Seq(
      (1L, "a", 10.0),        // unchanged
      (2L, "B", 20.0),        // changed (s)
      (4L, "", 40.0),         // changed: null → empty string must differ
      (5L, "e", 50.0)         // inserted; 3 deleted
    ).toDF("k", "s", "v")
    val got = Scd2.snapshotDiff(old, niu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "deleted",
      4L -> "changed", 5L -> "inserted"))
  }

  test("snapshotDiff field boundaries: (ab,c) != (a,bc)") {
    val old = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val niu = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = Scd2.snapshotDiff(old, niu, Seq("k")).collect()
    assert(got.length == 1 && got(0).getString(1) == "changed")
  }
}
