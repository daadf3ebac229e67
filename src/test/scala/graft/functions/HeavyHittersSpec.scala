package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(HeavyHittersAgg.heavyHitters(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.est", "h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: cap >= distinct gives exact counts, any partitioning") {
    val items = (1 to 500).map(i => s"k${i % 7}")
    val expect = items.groupBy(identity).map { case (k, xs) =>
      (k, xs.size.toLong, 0L)
    }.toSeq.sortBy(t => (-t._2, t._1))
    Seq(1, 9).foreach { parts =>
      val got = summary(items.toDF("item").repartition(parts), cap = 16).toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("overflow regime: published SpaceSaving bounds hold on skewed input") {
    // one hot item (1000), 200 singleton tail; cap 16 << 201 distinct
    val items = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"tail$i")
    val n = items.size
    val cap = 16
    val got = summary(items.toDF("item").repartition(5), cap)
    assert(got.length <= cap)
    // every item with true frequency > n/cap must be present
    val hot = got.find(_._1 == "hot").get
    // true <= est <= true + err, and err <= n/cap per partial chain;
    // merged errors sum, still bounded by n/cap overall here
    assert(hot._2 >= 1000L && hot._2 <= 1000L + hot._3)
    got.foreach { case (item, est, err) =>
      val truth = if (item == "hot") 1000L else 1L
      assert(est >= truth && est - err <= truth,
        s"$item est=$est err=$err truth=$truth")
    }
    assert(got.map(_._3).max <= n / cap * 2,
      "merged error stays within the summed-partials bound")
  }

  test("SQL text form via session registration") {
    Seq("a", "a", "b").toDF("item").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT explode(graft_heavyhitters(item, 4)) AS h FROM hh_in")
      .select("h.item", "h.est").collect().toSeq
    assert(rows == Seq(Row("a", 2L), Row("b", 1L)))
  }

  test("nulls are skipped; empty input gives an empty summary") {
    val got = summary(
      Seq(Some("x"), None, Some("x")).toDF("item"), cap = 4)
    assert(got.toSeq == Seq(("x", 2L, 0L)))
    assert(summary(Seq.empty[String].toDF("item"), cap = 4).isEmpty)
  }
}
