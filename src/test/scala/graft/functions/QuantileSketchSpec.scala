package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def sketchQuantiles(vals: Seq[Double], cap: Int,
                              parts: Int): Seq[Double] = {
    val sm = vals.toDF("v").repartition(parts)
      .agg(QuantileSketchAgg.sketch(col("v"), cap).as("sm"))
    sm.select(qs.map(q =>
        QuantileSketchAgg.quantileAt(col("sm"), q).as(s"q$q")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Double])
  }

  /** Reference: smallest value at 1-based rank ceil(q·n). */
  private def exact(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    sorted(math.max(1, math.ceil(q * vals.size).toLong).toInt - 1)
  }

  test("exact regime: distincts <= cap reproduce rank-exact quantiles") {
    // duplicates force the coalesce path; 97 distincts < cap 128
    val vals = (1 to 5000).map(i => (i % 97).toDouble * 1.5)
    Seq(1, 7, 32).foreach { parts =>
      val got = sketchQuantiles(vals, cap = 128, parts)
      assert(got == qs.map(exact(vals, _)), s"parts=$parts")
    }
  }

  test("lossy regime: rank error bounded on adversarial orderings") {
    val n = 20000
    val cap = 256
    val base = (1 to n).map(_.toDouble)
    val orderings = Seq(
      base,                                     // sorted
      base.reverse,                             // reverse sorted
      base.sortBy(v => (v.toLong * 2654435761L) % n)) // hash-shuffled
    orderings.foreach { vals =>
      val got = sketchQuantiles(vals, cap, parts = 8)
      qs.zip(got).foreach { case (q, v) =>
        val trueRank = math.ceil(q * n)
        // single-level compactor: empirical rank error well under 5%·n
        assert(math.abs(v - trueRank) <= 0.05 * n,
          s"q=$q got=$v want-rank=$trueRank")
      }
    }
  }

  test("mergeable summaries: shard sketches re-aggregate to the whole") {
    val vals = (1 to 3000).map(i => (i % 50).toDouble)
    // per-shard summaries, then explode and re-sketch the weighted
    // entries by replaying each (v, w) as w occurrences is the
    // algebra's identity in the exact regime
    val shards = vals.zipWithIndex.map { case (v, i) => (i % 4, v) }
      .toDF("shard", "v")
    val perShard = shards.groupBy("shard")
      .agg(QuantileSketchAgg.sketch(col("v"), 64).as("sm"))
    val replayed = perShard
      .select(explode(col("sm")).as("e"))
      .select(explode(expr("array_repeat(e.v, CAST(e.w AS INT))")).as("v"))
    val merged = replayed
      .agg(QuantileSketchAgg.sketch(col("v"), 64).as("sm"))
      .select(qs.map(q =>
        QuantileSketchAgg.quantileAt(col("sm"), q).as(s"q$q")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Double])
    assert(merged == qs.map(exact(vals, _)))
  }

  test("SQL registration, null skipping, empty summary") {
    Seq(Some(3.0), None, Some(1.0), Some(2.0)).toDF("v")
      .createOrReplaceTempView("qsk_in")
    val sm = spark.sql(
      "SELECT graft_quantile_sketch(v, 8) AS sm FROM qsk_in")
    assert(sm.select(explode(col("sm")).as("e")).select("e.v", "e.w")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq ==
      Seq((1.0, 1L), (2.0, 1L), (3.0, 1L)))
    val empty = Seq.empty[Double].toDF("v")
      .agg(QuantileSketchAgg.sketch(col("v"), 8).as("sm"))
      .select(size(col("sm"))).collect().head.getInt(0)
    assert(empty == 0)
    // rank query on an empty summary is null, not a crash
    val nullQ = Seq.empty[Double].toDF("v")
      .agg(QuantileSketchAgg.sketch(col("v"), 8).as("sm"))
      .select(QuantileSketchAgg.quantileAt(col("sm"), 0.5).as("m"))
      .collect().head
    assert(nullQ.isNullAt(0))
  }
}
