package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training.
  *
  * Scale decomposition: the only corpus-scale pass is word counting —
  * one map-combined groupBy over the exploded token stream. Everything
  * after runs in VOCABULARY space (distinct words × their current
  * segmentations), which is millions of rows when the corpus is
  * billions of documents. Each merge round is: adjacent-pair
  * frequencies (map-combined agg), argmax (a 1-row collect), and a
  * typed map applying the merge — with `localCheckpoint` truncating
  * the per-round lineage, the same discipline as
  * [[Dedup.connectedComponents]].
  */
object Bpe {

  /** One vocabulary entry: a distinct word, its corpus count, and its
    * current symbol segmentation. */
  final case class VocabWord(word: String, wcount: Long, segs: Seq[String])

  /** Corpus-scale word counts — the single corpus-wide shuffle. */
  def wordCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcount"))

  /** Initial vocabulary: every word split into single characters. */
  def initVocab(df: DataFrame, text: String): Dataset[VocabWord] = {
    val spark = df.sparkSession
    import spark.implicits._
    wordCounts(df, text)
      // split(_, "") keeps a trailing "" (limit -1 semantics) — drop it
      .select(col("word"), col("wcount"),
        filter(split(col("word"), ""), s => s =!= "").as("segs"))
      .as[VocabWord]
  }

  /** Adjacent-symbol pair frequencies weighted by word count.
    * Named-struct transform over the index range — no UDF, no join. */
  def pairStats(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("segs")) >= 2)
      .select(col("wcount"), explode(expr(
        "transform(sequence(1, size(segs) - 1)," +
          " i -> struct(segs[i-1] AS a, segs[i] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wcount")).as("freq"))

  /** Merge every non-overlapping left-to-right occurrence of (a, b). */
  private[graft] def mergeSegs(segs: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < segs.length) {
      if (i + 1 < segs.length && segs(i) == a && segs(i + 1) == b) {
        out += a + b; i += 2
      } else { out += segs(i); i += 1 }
    }
    out.result()
  }

  /** Learn `merges` BPE merge rules from the corpus. Deterministic:
    * ties on frequency break lexicographically on (a, b). */
  def train(df: DataFrame, text: String, merges: Int): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = initVocab(df, text).localCheckpoint()
    val learned = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      val top = pairStats(vocab.toDF)
        .orderBy(col("freq").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((a, b))
        val prev = vocab
        vocab = vocab.map(w => w.copy(segs = mergeSegs(w.segs, a, b)))
          .localCheckpoint()
        prev.unpersist()
        round += 1
      }
    }
    learned.result()
  }

  /** Segment `text` with learned merge rules: tokens column appended.
    * Runs in row space but the merge loop is per-word and the rule
    * list is a broadcast-sized closure constant. */
  def encode(df: DataFrame, text: String, merges: Seq[(String, String)],
             out: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val rules = spark.sparkContext.broadcast(merges)
    val segUdf = udf { s: String =>
      if (s == null) null
      else s.split(" ").filter(_.nonEmpty).flatMap { w =>
        var segs: Seq[String] = w.split("").toSeq
        rules.value.foreach { case (a, b) => segs = mergeSegs(segs, a, b) }
        segs
      }.toSeq
    }
    df.withColumn(out, segUdf(col(text)))
  }
}
