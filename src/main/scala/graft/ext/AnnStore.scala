package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.RefIndexStore

/** Persistent PQ SERVING index — the ANN counterpart of
  * [[graft.streaming.RefIndexStore]], and the amortization mechanism
  * for the round-10 build-vs-serve measurement (SCALING.md: at sf1
  * the PQ gates' wall is ~all corpus-encode, serving costs
  * 11–31 ms/query on top): encode the corpus ONCE, persist
  * (codebook, codes, payload), and every query panel afterwards pays
  * only the ADC scan + refine join.
  *
  * Layout under `dir` (atomic publish + recover shared with
  * RefIndexStore — same staging/trash protocol and completeness
  * marker):
  *  - `codebook/` — (m, code, cvec) integer sub-quantizer entries
  *    (subspaces·ksub rows — driver-bounded by construction);
  *  - `codes/` — (corpus_id, codes) from [[Similarity.pqEncode]]:
  *    SCANNED per query batch, never joined, so plain parquet (not
  *    bucketed) is its right layout — `subspaces` small ints per
  *    corpus row, the memory-bandwidth serving regime;
  *  - `payload/` — (corpus_id, _cv) float vectors for the exact
  *    re-rank; only k·refine·panel rows are ever read per batch
  *    (the candidates join);
  *  - `meta/` — knobs, written last (the completeness marker).
  *
  * Everything downstream is bit-deterministic for the persisted
  * codebook, so a served ranking equals the in-session
  * [[Similarity.pqTopKRefined]] exactly — gated end-to-end (x210)
  * against the same oracle as x197. */
object AnnStore {

  /** In-session handle: integer codebook + the two frames. */
  case class PqServeIndex(subspaces: Int, ksub: Int, dim: Int,
                          codebook: Seq[Seq[Seq[Long]]],
                          codes: DataFrame, payload: DataFrame)

  /** Build: train the deterministic sample codebook and encode the
    * corpus once. The float vectors are read exactly here and never
    * again at query time (the PQ contract). */
  def buildPq(corpus: DataFrame, id: String, vec: String,
              subspaces: Int = 8, ksub: Int = 16, dim: Int = 64)
      : PqServeIndex = {
    val cb = Similarity.pqCodebook(corpus, id, vec, subspaces, ksub, dim)
    val codes = Similarity.pqEncode(corpus, id, vec, cb)
      .select(col(id).as("corpus_id"), col("codes"))
    val payload = corpus.select(col(id).as("corpus_id"), col(vec).as("_cv"))
    PqServeIndex(subspaces, ksub, dim, cb, codes, payload)
  }

  def savePq(idx: PqServeIndex, dir: String): Unit = {
    val spark = idx.codes.sparkSession
    import spark.implicits._
    RefIndexStore.atomicPublish(spark, dir, { stage =>
      idx.codebook.zipWithIndex.flatMap { case (entries, m) =>
        entries.zipWithIndex.map { case (cvec, c) => (m, c, cvec) }
      }.toDF("m", "code", "cvec")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(new Path(stage, "codebook").toString)
      idx.codes.write.mode(SaveMode.Overwrite)
        .parquet(new Path(stage, "codes").toString)
      idx.payload.write.mode(SaveMode.Overwrite)
        .parquet(new Path(stage, "payload").toString)
      RefIndexStore.writeMeta(spark, stage, Map(
        "kind" -> "pq", "subspaces" -> idx.subspaces.toString,
        "ksub" -> idx.ksub.toString, "dim" -> idx.dim.toString))
    })
  }

  def loadPq(spark: SparkSession, dir: String): PqServeIndex = {
    val meta = RefIndexStore.readMeta(spark, dir, "pq")
    val (subspaces, ksub) = (meta("subspaces").toInt, meta("ksub").toInt)
    // the codebook is subspaces·ksub rows by construction — the same
    // bounded-collect class as its training
    val rows = spark.read.parquet(new Path(dir, "codebook").toString)
      .select(col("m"), col("code"), col("cvec"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    require(rows.length == subspaces * ksub,
      s"codebook at $dir has ${rows.length} entries, " +
        s"expected $subspaces x $ksub")
    val cb = (0 until subspaces).map { m =>
      rows.filter(_._1 == m).sortBy(_._2).map(_._3.toIndexedSeq).toIndexedSeq
    }
    PqServeIndex(subspaces, ksub, meta("dim").toInt, cb,
      spark.read.parquet(new Path(dir, "codes").toString),
      spark.read.parquet(new Path(dir, "payload").toString))
  }

  /** Serve: ADC top-k (+ exact refine) from the persisted frames —
    * [[Similarity.pqTopKRefinedFromCodes]] over the loaded index. */
  def pqServe(queries: DataFrame, qId: String, qVec: String,
              idx: PqServeIndex, k: Int, refine: Int = 4): DataFrame =
    Similarity.pqTopKRefinedFromCodes(queries, qId, qVec,
      idx.codes, idx.payload, idx.codebook, k, refine)

  /** ADC-only serving (no refine) — [[Similarity.pqTopKFromCodes]]. */
  def pqServeAdc(queries: DataFrame, qId: String, qVec: String,
                 idx: PqServeIndex, k: Int): DataFrame =
    Similarity.pqTopKFromCodes(queries, qId, qVec, idx.codes,
      idx.codebook, k)

  /** Heal a pq index dir after a crashed save — the publish protocol
    * (staging/trash names, meta-as-completeness-marker) is shared
    * with [[RefIndexStore]], so its healer applies verbatim. */
  def recover(spark: SparkSession, dir: String): Boolean =
    RefIndexStore.recover(spark, dir)
}
