package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shard-sketch union estimates == whole-corpus sketch estimates") {
    val ev = graft.tables.t(spark, "/root/testdata/sf0.001", "events")
      .withColumn("shard", dayofmonth($"ts"))
    // write side: one sketch per (event_type, day shard)
    val sketches = Hll.sketchBy(ev, Seq("event_type"), "shard", "user_id")
    assert(sketches.count() > ev.select("event_type").distinct().count())
    // read side: union shards per event_type
    val merged = Hll.estimateAcrossShards(sketches, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: single sketch straight over the corpus — HLL merge is
    // lossless, so the two paths must agree EXACTLY, not just within ε
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12)))
        .as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct)
    // and the estimate lands near the exact distinct count
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
        s"$k: estimate $est vs exact ${exact(k)}")
    }
  }
}
