package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ext.Classify

/** Quality-filter-at-ingest: the in-row scoring form is STATELESS, so
  * a stream scores per micro-batch with no state store and must agree
  * with the batch DECIMAL path row-for-row. */
class ClassifyStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seed = Seq(
    ("curated article with sources and careful topic coverage", true),
    ("another curated encyclopedia article on the topic", true),
    ("buy cheap pills now click here limited offer", false),
    ("spam click click buy now cheap cheap deals", false))
  private val docs = (0L until 30L).map { i =>
    val words = if (i % 3 == 0) "curated article topic sources extra"
    else if (i % 3 == 1) "cheap spam click buy offer"
    else "topic cheap article click mixed signals"
    (i, s"$words doc$i")
  }

  test("stream scoring at ingest == batch rocchioScore, two triggers") {
    val w = Classify.rocchioWeights(seed.toDF("text", "y"), "text",
      col("y"), buckets = 512)
    val vec = Classify.weightVector(w, buckets = 512)

    // stage two parquet files → two micro-batches
    val flat = java.nio.file.Files.createTempDirectory("classify_stream")
    docs.take(15).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(flat.toString)
    docs.drop(15).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(flat.toString)
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    val q = stream
      .select(col("doc_id"), Classify.scoreColumn(col("text"), vec)
        .as("score"))
      .withColumn("pred", (col("score") > 0).cast("long"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_classify_stream").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("graft_classify_stream")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, p) => id -> ((s, p)) }.toMap
    val batch = Classify.rocchioScore(docs.toDF("doc_id", "text"),
        "doc_id", "text", w, buckets = 512)
      .select(col("doc_id"), col("score").cast("long"), col("pred"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, p) => id -> ((s, p)) }.toMap
    assert(streamed == batch)
    assert(streamed.size == 30)
    // the planted vocabularies actually separate
    assert(streamed(0L)._2 == 1L && streamed(1L)._2 == 0L)
  }

  test("weight vector guard rejects weights too wide for the doc bound") {
    val w = Classify.rocchioWeights(seed.toDF("text", "y"), "text",
      col("y"), buckets = 64)
    // tiny seed weights pass at the default bound AND at the shrunken
    // headroom (62 − 31 = 31 bits ≫ the seed's few-hundred products) —
    // a guard that fired on legitimate weights would fail here
    assert(Classify.weightVector(w, buckets = 64).length == 64)
    assert(Classify.weightVector(w, buckets = 64,
      maxDocTokens = Int.MaxValue).length == 64)
    // a synthetic 41-bit weight must trip the 31-bit headroom
    val wide = Seq((0L, new java.math.BigDecimal(java.math.BigInteger.ONE
      .shiftLeft(40)))).toDF("_b", "w")
    intercept[IllegalArgumentException] {
      Classify.weightVector(wide, buckets = 64, maxDocTokens = Int.MaxValue)
    }
    // and pass once the doc bound gives it room (62 − 10 = 52 bits)
    assert(Classify.weightVector(wide, buckets = 64,
      maxDocTokens = 1024)(0) == (1L << 40))
  }
}
