package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking — split documents at positions chosen by
  * the CONTENT, not by offset (gear/Rabin CDC family, here at token
  * granularity): a token whose salted hash bucket divides `divisor`
  * closes the current chunk. An insertion or deletion therefore only
  * perturbs chunking up to the next boundary token; every chunk after
  * it re-aligns and its digest is unchanged. That shift-invariance is
  * what fixed-size chunking (x32's `chunkTokens`) lacks, and it is
  * the standard primitive for dedup storage, incremental sync, and
  * shared-span discovery across near-identical documents.
  *
  * Scale shape: one posexplode (narrow), a per-document running sum
  * (window partitioned by doc id — never unpartitioned), one
  * (doc, chunk) aggregation whose collect is bounded by chunk length
  * (expected `divisor` tokens, content-capped). Boundary decisions
  * reuse [[Sampling.hashBucket256]]'s md5-byte convention, so an
  * external engine reproduces every boundary bit-for-bit.
  */
object Chunk {

  /** One row per content-defined chunk: `(doc, chunk_idx, n_tokens,
    * digest)` with digest = md5 of the space-joined chunk tokens.
    * Expected chunk length ≈ `divisor` tokens (boundary probability
    * is ~1/divisor per token, content-determined). */
  def cdcChunks(df: DataFrame, id: String, text: String,
                divisor: Int = 8, salt: String = "cdc"): DataFrame = {
    require(divisor >= 2 && 256 % divisor == 0,
      "divisor must divide 256 so the boundary rate is exactly 1/divisor")
    val toks = filter(split(col(text), " "), t => t =!= "")
    val tk = df
      .select(col(id).as("doc"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("flag",
        (Sampling.hashBucket256(col("tok"), salt) % divisor === 0)
          .cast("long"))
    // chunk index = boundaries strictly BEFORE this token (a boundary
    // token closes its chunk), as a per-doc running sum
    val w = Window.partitionBy("doc").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    tk.withColumn("chunk_idx", coalesce(sum(col("flag")).over(w), lit(0L)))
      .groupBy("doc", "chunk_idx")
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok"))).cast("binary")).as("digest"))
  }

  /** Cross-document shared-chunk discovery over [[cdcChunks]]: chunk
    * digests appearing in more than one document, with occurrence
    * counts — the content-defined analogue of duplicated-span
    * discovery (x32), robust to span offsets. */
  def sharedChunks(df: DataFrame, id: String, text: String,
                   divisor: Int = 8, salt: String = "cdc",
                   minTokens: Int = 2): DataFrame =
    cdcChunks(df, id, text, divisor, salt)
      .filter(col("n_tokens") >= minTokens)
      .groupBy("digest")
      .agg(
        countDistinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        first(col("n_tokens")).as("n_tokens"))
      .filter(col("n_docs") > 1)
}
