package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Planes}

/** Streaming MinHash near-dup-at-ingest — the third modality of the
  * dedup-at-ingest family ([[EmbedStream]] for embeddings,
  * [[SimHashStream]] for hamming-ball signatures, this for
  * JACCARD-thresholded shingle overlap, the classic crawl-dedup
  * decision): flag stream documents whose exact n-gram Jaccard
  * against a STATIC reference corpus passes a threshold, with MinHash
  * banding as the candidate generator — the online counterpart of
  * [[graft.ext.Dedup.minhashLshPairsAcross]].
  *
  * The piece Structured Streaming was missing is the SIGNATURE: the
  * batch path aggregates exploded shingle rows ([[graft.functions.MinHashAgg]]),
  * which is stateful on a stream; here the per-row native
  * [[graft.functions.MinHashArray]] computes the identical signature
  * (property-tested bit-equal) from the in-row shingle set, so the
  * whole probe is stateless scan arithmetic. The oversized-bucket
  * census counts the REFERENCE side only — identical in the
  * build-once index and [[graft.ext.Planes.cappedCrossPairs]]'s batch
  * path, so stream and batch replay agree EXACTLY, hot buckets
  * included. Candidates verify with the exact Jaccard
  * ([[graft.functions.IntersectCount]] against the reference shingle
  * payload) — LSH only prunes; verified similarity decides, same as
  * every batch near-dup operator in the library.
  */
object MinHashStream {

  /** Pre-banded static MinHash reference for [[minhashDupMatches]]:
    * `ns` is the reference-only oversized-bucket census; `bandRows`
    * carries (band, bucket, sub, id_b); `payload` the reference
    * shingle sets (shs, sz) the exact verify reads. */
  case class MinHashRefIndex(n: Int, threshold: Double, bands: Int,
                             rowsPerBand: Int, maxBucket: Int,
                             ns: DataFrame, bandRows: DataFrame,
                             payload: DataFrame)

  def minhashRefIndex(ref: DataFrame, id: String, text: String, n: Int,
                      threshold: Double, bands: Int = 64,
                      rowsPerBand: Int = 2, maxBucket: Int = 4096)
      : MinHashRefIndex = {
    require(maxBucket >= 1, "maxBucket must be positive")
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val parts = ref.sparkSession.sessionState.conf.numShufflePartitions
    val sets = ref.select(col(id).as("_id"), col(text).as("_text"))
      .repartition(parts)
      .select(col("_id"), Dedup.shingles(col("_text"), n).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
      .localCheckpoint()
    // batch index build uses the map-combined AGGREGATE signature —
    // bit-identical to the stream probe's per-row MinHashArray
    val k = bands * rowsPerBand
    val sig = sets.select(col("_id"), explode(col("shs")).as("sh"))
      .groupBy("_id")
      .agg(graft.functions.MinHashAgg.minhash(col("sh"), k).as("sig"))
    val banded = sig.select(col("_id").as("id_b"),
        posexplode(Dedup.minhashBandCols(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("id_b"))
      .localCheckpoint()
    val (ns, withSub) = Planes.refCensusSub(banded, maxBucket)
    val payload = sets.select(col("_id").as("id_b"),
      col("shs").as("_shs_b"), col("sz").as("_sz_b"))
    MinHashRefIndex(n, threshold, bands, rowsPerBand, maxBucket,
      ns, withSub, payload)
  }

  /** Incrementally merge newly-accumulated reference documents —
    * [[EmbedStream.mergeRefIndex]]'s MinHash sibling, same parity
    * contract: old band rows reused verbatim (signatures are
    * per-document functions), only the new slice shingles/signs/bands,
    * the ids-only census refresh re-assigns every row's sub. */
  def mergeRefIndex(idx: MinHashRefIndex, more: DataFrame, id: String,
                    text: String): MinHashRefIndex = {
    val parts = more.sparkSession.sessionState.conf.numShufflePartitions
    val sets = more.select(col(id).as("_id"), col(text).as("_text"))
      .repartition(parts)
      .select(col("_id"), Dedup.shingles(col("_text"), idx.n).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
      .localCheckpoint()
    val k = idx.bands * idx.rowsPerBand
    val sig = sets.select(col("_id"), explode(col("shs")).as("sh"))
      .groupBy("_id")
      .agg(graft.functions.MinHashAgg.minhash(col("sh"), k).as("sig"))
    val allRows = idx.bandRows
      .select(col("band"), col("bucket"), col("id_b"))
      .unionByName(sig.select(col("_id").as("id_b"),
          posexplode(Dedup.minhashBandCols(col("sig"), idx.bands,
            idx.rowsPerBand)).as(Seq("band", "bucket")))
        .select(col("band"), col("bucket"), col("id_b")))
      .localCheckpoint()
    val (ns, withSub) = Planes.refCensusSub(allRows, idx.maxBucket)
    // only the NEW slice's payload materializes (see
    // EmbedStream.mergeRefIndex): sets is already checkpointed, so
    // the union over materialized frames stays lazy
    val payload = idx.payload.unionByName(
      sets.select(col("_id").as("id_b"),
        col("shs").as("_shs_b"), col("sz").as("_sz_b")))
    MinHashRefIndex(idx.n, idx.threshold, idx.bands, idx.rowsPerBand,
      idx.maxBucket, ns, withSub, payload)
  }

  /** Match stream documents against the reference index: emits
    * (id_a, id_b, jaccard) — plus any `carry` columns — for every
    * stream document whose EXACT n-gram Jaccard against a reference
    * document reaches the index's threshold (banding prunes; the
    * verified similarity decides). Works identically on a batch
    * DataFrame (the spec's stream==batch gate). Pass `dedupWatermark`
    * (+ `ts`) for bounded-state per-pair dedup of multi-band hits. */
  def minhashDupMatches(stream: DataFrame, idx: MinHashRefIndex,
                        id: String, text: String,
                        carry: Seq[String] = Seq.empty,
                        ts: String = "", dedupWatermark: String = "")
      : DataFrame = {
    require(dedupWatermark.isEmpty || ts.nonEmpty,
      "ts must name the event-time column when dedupWatermark is set")
    val carryCols = carry.map(c => col(c))
    // shingles, signature and buckets all in ONE row (no aggregate,
    // no stream self-join): the per-row native MinHashArray is what
    // makes the streaming shape possible
    val k = idx.bands * idx.rowsPerBand
    val withSig = stream.select(
      Seq(col(id).as("_id"), Dedup.shingles(col(text), idx.n).as("_shs")) ++
        carryCols: _*)
      .withColumn("_sz", size(col("_shs")).cast("long"))
      .withColumn("_sig",
        graft.functions.MinHashArray.minhashArray(col("_shs"), k))
    val probes = withSig.select(
        Seq(col("_id"), col("_shs"), col("_sz"),
          posexplode(Dedup.minhashBandCols(col("_sig"), idx.bands,
            idx.rowsPerBand)).as(Seq("band", "bucket"))) ++ carryCols: _*)
      .join(broadcast(idx.ns), Seq("band", "bucket"), "left")
      .withColumn("sub", when(col("_ns").isNull, lit(0L))
        .otherwise(pmod(Planes.subHash(col("_id")), col("_ns"))))
    // the reference index is corpus-sized: never broadcast it
    val matches = probes
      .join(idx.bandRows, Seq("band", "bucket", "sub"))
      .join(idx.payload, Seq("id_b"))
      .withColumn("_shared", graft.functions.IntersectCount.intersectCount(
        col("_shs"), col("_shs_b")))
      .select(Seq(col("_id").as("id_a"), col("id_b"),
        (col("_shared").cast("double") /
          (col("_sz") + col("_sz_b") - col("_shared"))).as("jaccard")) ++
        carryCols.map(identity): _*)
      .filter(col("jaccard") >= idx.threshold)
    if (dedupWatermark.isEmpty) matches
    else matches.withWatermark(ts, dedupWatermark)
      .dropDuplicatesWithinWatermark("id_a", "id_b")
  }
}
