package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed equal-bucket join plans with zero Exchange") {
    val facts = spark.range(10000).select($"id".as("k"),
      ($"id" % 97).as("v"))
    val dims = spark.range(2000).select($"id".as("k"),
      concat(lit("d"), $"id").as("name"))
    Buckets.writeBucketed(facts, "bspec_facts", "k", 8)
    Buckets.writeBucketed(dims, "bspec_dims", "k", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Buckets.table(spark, "bspec_facts")
        .join(Buckets.table(spark, "bspec_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"), plan.take(2000))
      // correctness: every dim key matches
      assert(joined.count() == 2000)
      // aggregation on the bucket key also rides the layout: no exchange
      val agg = Buckets.table(spark, "bspec_facts").groupBy($"k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }
}
