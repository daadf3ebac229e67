package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ext.Dedup

class EmbedStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkVec(i: Long): Array[Double] =
    Array.tabulate(8)(j => math.cos((i % 5 + 1) * (j + 2) * 0.31))

  test("streaming semantic dedup matches == batch Across, across triggers") {
    // reference corpus: ids 100-119; stream: ids 0-19 over TWO triggers
    val ref = (100L until 120L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val idx = EmbedStream.semanticRefIndex(ref, "vec_id", "embedding",
      bands = 4, bitsPerBand = 4, dim = 8)
    val streamRows = (0L until 20L).map(i => (i, mkVec(i)))
    // stage as two parquet files -> two micro-batches
    val stage = java.nio.file.Files.createTempDirectory("embed_stream")
    streamRows.take(10).toDF("vec_id", "embedding").repartition(1)
      .write.parquet(stage.resolve("b0.dir").toString)
    streamRows.drop(10).toDF("vec_id", "embedding").repartition(1)
      .write.parquet(stage.resolve("b1.dir").toString)
    val flat = java.nio.file.Files.createTempDirectory("embed_flat")
    Seq("b0.dir", "b1.dir").zipWithIndex.foreach { case (f, i) =>
      val src = new java.io.File(stage.resolve(f).toString).listFiles()
        .filter(_.getName.endsWith(".parquet"))(0)
      java.nio.file.Files.copy(src.toPath, flat.resolve(s"$i.parquet"))
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EmbedStream.semanticDupMatches(stream, idx, "vec_id",
        "embedding", cos2Num = 4, cos2Den = 25)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_embed_matches").start()
    q.processAllAvailable()
    q.stop()
    // duplicates per matching band collapse via distinct for compare
    val streamed = spark.table("graft_embed_matches")
      .select("id_a", "id_b", "dotq", "na", "nb").distinct()
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = Dedup.semanticDupPairsInt8Across(
        streamRows.toDF("vec_id", "embedding"), ref, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, bands = 4, bitsPerBand = 4, dim = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // i % 5 classes span stream and reference
  }

  test("batch mode works on a plain DataFrame and honors the decision") {
    val ref = (100L until 110L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val idx = EmbedStream.semanticRefIndex(ref, "vec_id", "embedding",
      bands = 4, bitsPerBand = 4, dim = 8)
    val in = (0L until 10L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val rows = EmbedStream.semanticDupMatches(in, idx, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dotq, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dotq > 0 && 25 * dotq * dotq >= 4 * na * nb)
    }
  }
}
