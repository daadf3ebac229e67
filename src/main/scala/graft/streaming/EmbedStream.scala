package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{Planes, Similarity}

/** Streaming SEMANTIC dedup-at-ingest: flag embedding rows arriving on
  * a stream that are near-duplicates of a STATIC reference corpus —
  * the online counterpart of [[graft.ext.Dedup.semanticDupPairsInt8Across]]
  * (same deterministic plane banding, same integer int8 cosine²
  * decision, so the stream and a batch replay can never disagree on a
  * match).
  *
  * Built as a stream-static equi-join pipeline, which is STATELESS in
  * Structured Streaming: the stream side explodes to (band, bucket)
  * probe rows per micro-batch, joins the pre-banded reference index,
  * and scores candidates in-row — no watermark or state store needed
  * for the matching itself. The only stateful piece is the OPTIONAL
  * per-pair dedup (a pair matching in k bands emits k rows), which
  * rides `dropDuplicatesWithinWatermark` so its state stays bounded
  * like [[EventStream.dedupByDigest]]'s.
  */
object EmbedStream {

  /** Pre-banded, pre-quantized static reference for
    * [[semanticDupMatches]]: build once (e.g. nightly from the
    * accumulated corpus), reuse across micro-batches. `ns` is the
    * oversized-bucket census over the REFERENCE (≤ refRows/maxBucket
    * keys — always broadcastable); `bandRows` carries
    * (band, bucket, sub, id_b) only; `payload` the int8 vectors.
    * Sub-splitting differs from the batch operator's only in the
    * census population (reference-only vs both sides) — identical
    * whenever no bucket is oversized, and a per-batch stream flood
    * is bounded by the micro-batch size anyway. */
  case class SemanticRefIndex(bands: Int, bitsPerBand: Int, dim: Int,
                              maxBucket: Int, ns: DataFrame,
                              bandRows: DataFrame, payload: DataFrame)

  def semanticRefIndex(ref: DataFrame, id: String, vec: String,
                       bands: Int = 0, bitsPerBand: Int = 0,
                       dim: Int = 64, maxBucket: Int = 4096)
      : SemanticRefIndex = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val parts = ref.sparkSession.sessionState.conf.numShufflePartitions
    val (nBands, nBits) =
      if (bands > 0 && bitsPerBand > 0) (bands, bitsPerBand)
      else {
        val bits = if (bitsPerBand > 0) bitsPerBand
                   else Planes.bitsFor(ref.count())
        (if (bands > 0) bands else Planes.bandsFor(bits), bits)
      }
    val planes = Planes.components(nBands * nBits, dim)
    // sketch through the Generate pipeline (see semanticDupPairsInt8)
    val banded = ref.select(col(id).as("_id"), col(vec).as("_fv"))
      .repartition(parts)
      .select(col("_id"),
        posexplode(Planes.bandBuckets(col("_fv"), planes, nBands, nBits))
          .as(Seq("band", "bucket")))
      .localCheckpoint()
    val ns = banded.groupBy("band", "bucket")
      .agg(graft.ext.IntMath.truncDiv(count(lit(1)) + (maxBucket - 1),
        lit(maxBucket.toLong)).as("_ns"))
      .filter(col("_ns") > 1)
      .localCheckpoint()
    val withSub = banded.join(broadcast(ns), Seq("band", "bucket"), "left")
      .select(col("band"), col("bucket"),
        when(col("_ns").isNull, lit(0L))
          .otherwise(pmod(Planes.subHash(col("_id")), col("_ns"))).as("sub"),
        col("_id").as("id_b"))
      .localCheckpoint()
    val payload = ref.select(col(id).as("id_b"),
        Similarity.int8Quantize(col(vec)).getField("q").as("_qb"))
      .localCheckpoint()
    SemanticRefIndex(nBands, nBits, dim, maxBucket, ns, withSub, payload)
  }

  /** Match stream rows against the reference index: emits
    * (id_a, id_b, dotq, na, nb) — plus any `carry` columns from the
    * stream row (e.g. its event time) — for every stream row whose
    * int8 cosine² against a reference vector passes
    * cos² ≥ cos2Num/cos2Den (and dotq > 0). Works identically on a
    * batch DataFrame (the spec's stream==batch gate).
    *
    * A pair sharing k (band, bucket) keys emits k rows — pass
    * `dedupWatermark` (with `ts` naming the stream's event-time
    * column) to collapse them through bounded-state
    * `dropDuplicatesWithinWatermark`; leave it None on batch inputs
    * or when a downstream exact-dedup already handles it. */
  def semanticDupMatches(stream: DataFrame, idx: SemanticRefIndex,
                         id: String, vec: String,
                         cos2Num: Long = 1, cos2Den: Long = 4,
                         carry: Seq[String] = Seq.empty,
                         ts: String = "", dedupWatermark: String = "")
      : DataFrame = {
    val planes = Planes.components(idx.bands * idx.bitsPerBand, idx.dim)
    val dotL = graft.functions.VectorExpressions.dot_long _
    val carryCols = carry.map(c => col(c))
    val probes = stream.select(
        Seq(col(id).as("id_a"),
          Similarity.int8Quantize(col(vec)).getField("q").as("_qa"),
          posexplode(Planes.bandBuckets(col(vec), planes, idx.bands,
            idx.bitsPerBand)).as(Seq("band", "bucket"))) ++ carryCols: _*)
      .join(broadcast(idx.ns), Seq("band", "bucket"), "left")
      .withColumn("sub", when(col("_ns").isNull, lit(0L))
        .otherwise(pmod(Planes.subHash(col("id_a")), col("_ns"))))
    // the reference index is corpus-sized: NEVER broadcast it (the
    // x152-class mistake). These are per-micro-batch equi-joins; AQE
    // sizes the exchanges, and at scale the index can be bucketed on
    // the join keys to avoid re-shuffling the static side per batch.
    val matches = probes
      .join(idx.bandRows, Seq("band", "bucket", "sub"))
      .join(idx.payload, Seq("id_b"))
      .select(Seq(col("id_a"), col("id_b"),
        dotL(col("_qa"), col("_qb")).as("dotq"),
        dotL(col("_qa"), col("_qa")).as("na"),
        dotL(col("_qb"), col("_qb")).as("nb")) ++ carryCols.map(identity): _*)
      .filter(col("dotq") > 0 && col("na") > 0 && col("nb") > 0 &&
        col("dotq") * col("dotq") * lit(cos2Den) >=
          lit(cos2Num) * col("na") * col("nb"))
    if (dedupWatermark.isEmpty) matches
    else matches.withWatermark(ts, dedupWatermark)
      .dropDuplicatesWithinWatermark("id_a", "id_b")
  }
}
