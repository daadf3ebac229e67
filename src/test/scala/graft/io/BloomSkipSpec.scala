package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // secondary values are localized: each "user-K" appears on rows whose
  // primary ids cluster into few shards, so pruning has something to skip
  private def table(n: Int) =
    spark.range(n).select(
      $"id".as("pk"),
      concat(lit("user-"), ($"id" % 50).cast("string")).as("owner"),
      ($"id" * 7).as("payload"))

  test("bloom-pruned secondary scan == full-scan filter (no false negatives)") {
    val dir = Files.createTempDirectory("bloom").toString + "/t"
    BloomSkip.writeSharded(table(400).toDF(), dir, "pk", "owner", shards = 8)
    (0 until 50 by 7).map(k => s"user-$k").foreach { v =>
      val pruned = BloomSkip.scanSecondary(spark, dir, "owner", v)
        .select("pk").as[Long].collect().sorted.toSeq
      val full = spark.read.parquet(dir).filter($"owner" === v)
        .select("pk").as[Long].collect().sorted.toSeq
      assert(pruned == full, s"probe $v")
      assert(full.nonEmpty)
    }
  }

  test("pruning skips shards for localized keys and absent probes") {
    val dir = Files.createTempDirectory("bloom").toString + "/t"
    // one distinct owner per pk → each owner lives in exactly ONE shard
    val df = spark.range(256).select(
      $"id".as("pk"), concat(lit("o"), $"id").as("owner"))
    BloomSkip.writeSharded(df.toDF(), dir, "pk", "owner", shards = 8)
    val sizes = (0L until 256L by 37L).map { i =>
      val c = BloomSkip.candidateShards(spark, dir, s"o$i")
      // never a false negative: the true shard must be a candidate
      val row = BloomSkip.scanSecondary(spark, dir, "owner", s"o$i")
        .select("pk").as[Long].collect()
      assert(row.toSeq == Seq(i))
      c.size
    }
    // with 32 keys × 5 hashes in a 2^17-bit filter, false-positive rate
    // is ~0 — localized probes must touch far fewer than all 8 shards
    assert(sizes.max <= 2, s"candidate counts: $sizes")
    // absent value: every shard pruned, empty result, schema intact
    val missing = BloomSkip.scanSecondary(spark, dir, "owner", "o-not-there")
    assert(missing.count() == 0)
    assert(BloomSkip.candidateShards(spark, dir, "o-not-there").isEmpty)
  }

  test("write-side Column positions == probe-side driver positions") {
    val m = BloomSkip.DefaultBits
    Seq("alpha", "user-17", "", "héllo ✓").foreach { v =>
      (0 until 5).foreach { i =>
        val sparkPos = spark.range(1)
          .select(expr(
            s"CAST(conv(substring(md5(CAST(concat('$i:', '$v') AS BINARY)), 1, 15), 16, 10) AS BIGINT) % $m")
            .cast("int"))
          .as[Int].head()
        assert(sparkPos == BloomSkip.posDriver(v, i, m), s"$v/$i")
      }
    }
  }

  test("null secondaries set no bits and never match") {
    val dir = Files.createTempDirectory("bloom").toString + "/t"
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("pk", "owner")
    BloomSkip.writeSharded(df, dir, "pk", "owner", shards = 2)
    assert(BloomSkip.scanSecondary(spark, dir, "owner", "a")
      .select("pk").as[Long].collect().toSeq == Seq(1L))
  }
}
