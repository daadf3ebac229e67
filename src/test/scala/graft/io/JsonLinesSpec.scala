package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n).select($"id".as("doc_id"),
      concat(lit("text "), $"id").as("text"),
      ($"id" % 3).cast("int").as("grp"))

  test("jsonl round trip preserves rows; explicit schema read") {
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    val d = docs(500)
    JsonLines.write(d, dir)
    val back = JsonLines.read(spark, dir, Some(d.schema))
    // json reads are always nullable — compare names/types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      d.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy($"doc_id").collect().toSeq ==
      d.orderBy($"doc_id").collect().toSeq)
  }

  test("sharded write: n shard dirs, deterministic assignment, balance") {
    val dir = Files.createTempDirectory("jsonlsh").toString + "/corpus"
    val n = 8
    JsonLines.writeSharded(docs(4000), dir, key = "doc_id", n = n)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.length == n)
    val back = spark.read.json(dir)
    assert(back.count() == 4000)
    // every row sits in the shard its key hashes to
    val misplaced = back.filter(
      pmod(xxhash64($"doc_id"), lit(n.toLong)) =!= $"shard").count()
    assert(misplaced == 0)
    // hash balance: no shard more than 2x the even share
    val sizes = back.groupBy($"shard").count().collect().map(_.getLong(1))
    assert(sizes.length == n && sizes.forall(_ < 2 * 4000 / n))
  }
}
