package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Persistence parity for the PQ serving index: a loaded index must
  * serve every panel exactly like the in-session pipeline it encodes
  * (codes, codebook and payload all survive byte-exactly), and the
  * save is an atomic overwrite on the shared staging protocol. */
class AnnStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkVec(i: Long): Array[Double] =
    Array.tabulate(16)(j => math.cos((i % 7 + 1) * (j + 2) * 0.23))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  test("pq index: build/save/load round-trip; served ranking == in-session") {
    val corpus = (0L until 60L).map(i => (i, mkVec(i))).toDF("vec_id", "embedding")
    val queries = (0L until 60L by 7).map(i => (1000L + i, mkVec(i)))
      .toDF("vec_id", "embedding")
    val idx = AnnStore.buildPq(corpus, "vec_id", "embedding",
      subspaces = 4, ksub = 8, dim = 16)
    val dir = tmp("annstore")
    AnnStore.savePq(idx, dir)
    val loaded = AnnStore.loadPq(spark, dir)
    assert(loaded.codebook == idx.codebook) // integer entries, order and all
    assert(loaded.codes.as[(Long, Seq[Int])].collect().toSet ==
      idx.codes.as[(Long, Seq[Int])].collect().toSet)
    def ranking(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"corpus_id")
        .as[(Long, Long, Long)].collect().toSet
    // served-from-disk == the one-call in-session pipeline
    val inSession = ranking(Similarity.pqTopKRefined(queries, "vec_id",
      "embedding", corpus, "vec_id", "embedding", idx.codebook,
      k = 5, refine = 3))
    val fromDisk = ranking(AnnStore.pqServe(queries, "vec_id", "embedding",
      loaded, k = 5, refine = 3))
    assert(fromDisk == inSession && fromDisk.nonEmpty)
    // the ADC-only leg agrees too (no refine)
    assert(ranking(AnnStore.pqServeAdc(queries, "vec_id", "embedding",
        loaded, k = 5)) ==
      ranking(Similarity.pqTopK(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", idx.codebook, k = 5)))
  }

  test("save over an existing pq index swaps atomically") {
    val mk = (n: Long) => AnnStore.buildPq(
      (0L until n).map(i => (i, mkVec(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", subspaces = 4, ksub = 8, dim = 16)
    val dir = tmp("annstore_swap")
    AnnStore.savePq(mk(20), dir)
    AnnStore.savePq(mk(40), dir)
    assert(AnnStore.loadPq(spark, dir).codes.count() == 40)
    // kind guard: a RefIndexStore loader refuses a pq dir loudly
    val e = intercept[IllegalArgumentException](
      graft.streaming.RefIndexStore.loadSemantic(spark, dir))
    assert(e.getMessage.contains("kind"))
  }
}
