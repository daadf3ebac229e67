package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random hyperplanes for cosine LSH, derived
  * from md5 so that BOTH engines (Spark and the DuckDB oracle) can
  * reproduce them bit-for-bit — the same engine-portability trick as
  * SimHash ([[Dedup.simhash64]]).
  *
  * Component contract (mirrored exactly by [[planesCteSql]]):
  * {{{
  *   r(p, i) = int(md5("p:i")[0:6 hex digits]) / 16777216.0 - 0.5
  * }}}
  * a uniform double in [-0.5, 0.5). The Spark side hoists the whole
  * plane matrix to literal arrays at plan time (they are data-
  * independent), so the per-row sketch is just `bits` codegen'd
  * [[graft.functions.DotProduct]] calls — no interpreted higher-order
  * functions, no hashing in the hot path. The DuckDB side derives the
  * identical doubles in SQL (md5 → nibble strpos → exact integer
  * arithmetic in doubles → same division/subtraction).
  *
  * Sign-bit sketches built from these planes are the scale path for
  * embedding dedup / ANN: candidates co-group on (band, bucket) keys,
  * so the pair join never goes quadratic in the corpus.
  */
object Planes {

  /** Plane matrix: `nPlanes` rows of `dim` deterministic components. */
  def components(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) / 16777216.0 - 0.5
    }

  /** Dot of a vector column with a literal plane (codegen'd). */
  private def planeDot(vec: Column, plane: Array[Double]): Column =
    graft.functions.VectorExpressions.dot_product(vec, typedLit(plane.toSeq))

  /** Full sign-bit sketch over all planes, as one long. Vector length
    * is validated like [[bandBuckets]] — a mismatch would sketch
    * everything to 0 and collapse every LSH bucket into one. */
  def sketch(vec: Column, planes: Array[Array[Double]]): Column = {
    val dim = planes.head.length
    val v = when(size(vec) === dim, vec).otherwise(raise_error(
      concat(lit("Planes.sketch: vector length "),
        coalesce(size(vec).cast("string"), lit("NULL")),
        lit(s" != plane dim $dim"))))
    planes.zipWithIndex.map { case (pl, j) =>
      when(planeDot(v, pl) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Per-band bucket ids (array of `bands` longs): band b's bucket is
    * the `bitsPerBand`-bit sign pattern of its plane slice.
    *
    * The vector length is VALIDATED against the plane dim at execution
    * time: on a mismatch (or a NULL vector) every plane dot would be
    * NULL and every bucket 0, so the downstream (band, bucket)
    * equi-join would silently degenerate to the full n×n cross product
    * on a single hot key — the exact quadratic blowup banding exists
    * to avoid, invisible on small fixtures and catastrophic at corpus
    * scale. Fail loudly instead; callers that tolerate NULL embeddings
    * must filter them out before banding. */
  def bandBuckets(vec: Column, planes: Array[Array[Double]],
                  bands: Int, bitsPerBand: Int): Column = {
    require(planes.length == bands * bitsPerBand,
      s"need ${bands * bitsPerBand} planes, got ${planes.length}")
    val dim = planes.head.length
    val v = when(size(vec) === dim, vec).otherwise(raise_error(
      concat(lit("Planes.bandBuckets: vector length "),
        coalesce(size(vec).cast("string"), lit("NULL")),
        lit(s" != banding dim $dim — pass the actual embedding dim " +
          "(the dim parameter) or fix the vector column"))))
    array((0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        when(planeDot(v, planes(b * bitsPerBand + j)) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Deterministic md5-derived sub-bucket hash for oversized-bucket
    * splitting: the first 6 hex digits of md5(id) as a long in
    * [0, 16^6). Engine-portable like the plane components — the
    * DuckDB side ([[cappedSkCteSql]]) derives the identical integer.
    * Splitting keys on the ID (not the vector), so a flood of
    * IDENTICAL vectors — the realistic pathological bucket — still
    * spreads uniformly across sub-buckets. */
  def subHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long")

  /** DuckDB CTEs `bsz` + `skb` mirroring the oversized-bucket
    * sub-split over an existing `sk(vec_id, band, bucket)` CTE:
    * ns = ceil(members / cap) per (band, bucket), sub =
    * md5-int(id) % ns — exactly [[subHash]] and the Spark-side
    * candidate generators. Join candidates on
    * (band, bucket, sub) from `skb`. */
  def cappedSkCteSql(cap: Int): String =
    s"""bsz AS (SELECT band, bucket,
       |    ((COUNT(*) + ${cap - 1}) // $cap) AS ns
       |  FROM sk GROUP BY band, bucket),
       |skb AS (SELECT sk.vec_id, sk.band, sk.bucket,
       |    CAST(list_reduce([ (strpos('0123456789abcdef',
       |        substr(md5(sk.vec_id::VARCHAR), j, 1)) - 1)
       |        * pow(16, 6 - j) for j in range(1, 7) ], (x, y) -> x + y)
       |      AS BIGINT) % bsz.ns AS sub
       |  FROM sk JOIN bsz ON bsz.band = sk.band AND bsz.bucket = sk.bucket)""".stripMargin

  /** [[cappedSkCteSql]]'s cross-corpus variant mirroring
    * [[cappedCrossPairs]]' REFERENCE-ONLY census: `bsz` counts only
    * the `sk` rows satisfying `refPred` (the history/reference side);
    * every `sk` row — both sides — left-joins that census and
    * sub-splits by md5-int(id) % ns (1 when the bucket is not
    * oversized on the reference). */
  def cappedSkRefCteSql(cap: Int, refPred: String): String =
    s"""bsz AS (SELECT band, bucket,
       |    ((COUNT(*) + ${cap - 1}) // $cap) AS ns
       |  FROM sk WHERE $refPred GROUP BY band, bucket),
       |skb AS (SELECT sk.vec_id, sk.band, sk.bucket,
       |    CAST(list_reduce([ (strpos('0123456789abcdef',
       |        substr(md5(sk.vec_id::VARCHAR), j, 1)) - 1)
       |        * pow(16, 6 - j) for j in range(1, 7) ], (x, y) -> x + y)
       |      AS BIGINT) % COALESCE(bsz.ns, 1) AS sub
       |  FROM sk LEFT JOIN bsz ON bsz.band = sk.band AND bsz.bucket = sk.bucket)""".stripMargin

  /** Reference-only oversized-bucket census + sub-assignment over
    * ids-only band rows — THE parity-critical block behind the three
    * streaming reference indexes and their merges
    * ([[graft.streaming.EmbedStream]] / [[graft.streaming.SimHashStream]] /
    * [[graft.streaming.MinHashStream]]); one definition so it can
    * never drift from [[cappedCrossPairs]]' batch arithmetic, which
    * the stream==batch parity specs pin. `banded` carries
    * (id_b, band, bucket) and should be materialized by the caller.
    * Returns (ns, bandRows): the (band, bucket, _ns) census of
    * buckets over `maxBucket` (broadcastable by pigeonhole — ≤
    * rows/maxBucket keys) and the sub-assigned
    * (band, bucket, sub, id_b) rows, both localCheckpointed (each is
    * read by every micro-batch join). */
  private[graft] def refCensusSub(banded: DataFrame, maxBucket: Int)
      : (DataFrame, DataFrame) = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val ns = banded.groupBy("band", "bucket")
      .agg(IntMath.truncDiv(count(lit(1)) + (maxBucket - 1),
        lit(maxBucket.toLong)).as("_ns"))
      .filter(col("_ns") > 1)
      .localCheckpoint()
    val withSub = banded.join(broadcast(ns), Seq("band", "bucket"), "left")
      .select(col("band"), col("bucket"),
        when(col("_ns").isNull, lit(0L))
          .otherwise(pmod(subHash(col("id_b")), col("_ns"))).as("sub"),
        col("id_b"))
      .localCheckpoint()
    (ns, withSub)
  }

  /** Distinct capped candidate pairs (id_a < id_b) from self-joining
    * (band, bucket) rows — THE shared oversized-bucket-safe generator
    * behind every banded self-pair operator (plane-LSH dedup, MinHash
    * LSH, the Similarity banded candidates). `bandRows` must carry
    * (_id, band, bucket) and SHOULD be materialized by the caller (it
    * is read three times: the oversized-bucket count and both join
    * probes).
    *
    * Buckets with more than `maxBucket` members are deterministically
    * sub-split into ceil(m / maxBucket) sub-buckets by [[subHash]] on
    * the id, capping candidate volume at ~rows · maxBucket — linear in
    * the corpus — at the cost of ~1/ns of the hot bucket's recall
    * contribution (other bands still vote). Buckets at or under the
    * cap are untouched: their candidate set is byte-identical to the
    * uncapped join.
    *
    * Scale shape: ONLY the oversized buckets (at most rows/maxBucket
    * of them, by pigeonhole) are collected into the broadcast side of
    * a left join — so this works unchanged when the bucket domain is
    * corpus-sized (MinHash's 64-bit hash buckets), where broadcasting
    * the full per-bucket count table would itself be a corpus-sized
    * broadcast. */
  private[ext] def cappedSelfPairs(bandRows: DataFrame, maxBucket: Int)
      : DataFrame = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val over = bandRows.groupBy("band", "bucket")
      .agg(IntMath.truncDiv(count(lit(1)) + (maxBucket - 1),
        lit(maxBucket.toLong)).as("_ns"))
      .filter(col("_ns") > 1)
    // fast path: no oversized buckets (the overwhelmingly common
    // case) ⇒ ns = 1 and sub = 0 everywhere, so the sub-split join is
    // BYTE-IDENTICAL to the plain (band, bucket) join — skip the
    // broadcast barrier and the per-row sub hash. The census is one
    // map-combined agg over the (caller-materialized) band rows, and
    // isEmpty short-circuits at the first surviving group.
    val rows =
      if (over.isEmpty)
        bandRows.select(col("_id"), col("band"), col("bucket"),
          lit(0L).as("sub"))
      else
        bandRows.join(broadcast(over), Seq("band", "bucket"), "left")
          .withColumn("sub", when(col("_ns").isNull, lit(0L))
            .otherwise(pmod(subHash(col("_id")), col("_ns"))))
          .select(col("_id"), col("band"), col("bucket"), col("sub"))
    rows.as("a").join(rows.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.sub") === col("b.sub") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
  }

  /** Two-sided variant of [[cappedSelfPairs]]: capped candidate pairs
    * between `ra` (id_a, band, bucket — the probe/new side) and `rb`
    * (id_b, band, bucket — the reference/history side). The
    * oversized-bucket census counts the REFERENCE side only, and both
    * sides sub-split against it:
    *
    *  - the volume bound survives: after the split every rb bucket
    *    holds ≤ maxBucket members, so each ra row generates at most
    *    bands · maxBucket candidates — linear in the probe side no
    *    matter how hot the key is on EITHER side (an unsplit ra flood
    *    just means many probe rows, each individually bounded);
    *  - the census is a pure function of the reference, so a
    *    PRECOMPUTED index over the reference
    *    ([[graft.streaming.EmbedStream.semanticRefIndex]]) carries
    *    the identical census and a streaming probe can never diverge
    *    from the batch replay — including when buckets ARE oversized
    *    (previously the batch censused both sides combined, which a
    *    build-once index cannot know, so the two disagreed exactly
    *    in the hot-bucket case the cap exists for).
    *
    * Only the oversized minority (≤ rbRows/maxBucket keys) is
    * broadcast. Both inputs should be materialized by the caller. */
  private[ext] def cappedCrossPairs(ra: DataFrame, rb: DataFrame,
                                    maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val over = rb.select(col("band"), col("bucket"))
      .groupBy("band", "bucket")
      .agg(IntMath.truncDiv(count(lit(1)) + (maxBucket - 1),
        lit(maxBucket.toLong)).as("_ns"))
      .filter(col("_ns") > 1)
    // same empty-census fast path as [[cappedSelfPairs]]
    val noOversized = over.isEmpty
    def sub(rows: DataFrame, idc: String) =
      if (noOversized)
        rows.select(col(idc), col("band"), col("bucket"), lit(0L).as("sub"))
      else
        rows.join(broadcast(over), Seq("band", "bucket"), "left")
          .withColumn("sub", when(col("_ns").isNull, lit(0L))
            .otherwise(pmod(subHash(col(idc)), col("_ns"))))
          .select(col(idc), col("band"), col("bucket"), col("sub"))
    sub(ra, "id_a").join(sub(rb, "id_b"), Seq("band", "bucket", "sub"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Corpus-aware `bitsPerBand`: the smallest bits ≥ 4 (≤ 16) at which
    * expected uniform bucket occupancy n / 2^bits drops to
    * `targetOccupancy` — the knob-scaling lesson measured on the sf1
    * ramp (SCALING.md round 7): candidate volume is ~bands · n² / 2^bits,
    * so bits must grow ~log₂ of corpus growth or in-bucket pair volume
    * goes quadratic. Integer arithmetic only (n >> bits), so the
    * derivation is bit-deterministic on any engine. */
  def bitsFor(n: Long, targetOccupancy: Int = 128): Int = {
    require(n >= 0 && targetOccupancy >= 1,
      "need n >= 0 and targetOccupancy >= 1")
    var b = 4
    while (b < 16 && (n >> b) > targetOccupancy) b += 1
    b
  }

  /** Corpus-aware IVF cluster count for the SemDeDup path
    * ([[Dedup.semanticDupPairsIvfInt8]]): the smallest k at which
    * expected cluster occupancy n / k drops to `targetOccupancy` —
    * the same lesson as [[bitsFor]] (SCALING.md round 8: at fixed
    * nClusters = 16 the measured decade ratio was 4.2×, cause named
    * as 10× cluster occupancy; k is the knob that must scale with n).
    * Exact integer arithmetic (ceiling division), so the derivation
    * is bit-deterministic on any engine.
    *
    * Clamped to [1, 2^16]: the ceiling bounds the broadcast codebook
    * (2^16 · dim longs ≈ 32 MB at dim 64) and the driver-side seed
    * fetch. Honest scale boundary: Lloyd assignment costs n · k =
    * n² / targetOccupancy distance evaluations per round — the IVF
    * path's inherent quadratic term (the published SemDeDup trains
    * on a subsample for the same reason). Past the ceiling
    * (n > targetOccupancy · 2^16, ~8.4 × 10⁹ at the default) —
    * and in any hot cluster before it — occupancy grows again and
    * the `maxBucket` sub-split bounds WALL TIME while diluting
    * within-cluster recall; beyond ~10⁷ vectors prefer the banded
    * plane-LSH path ([[Dedup.semanticDupPairsInt8]]), whose
    * bucket count scales as 2^bits with no training term.
    *
    * Recall trade (measured, SCALING.md round 10, x192 exhaustive at
    * sf1): occupancy is IVF's recall dial — fewer, larger clusters
    * catch more cross-cluster near-dups — and the derived k's recall
    * deficit vs the old fixed k = 16 is a LOOSE-threshold
    * phenomenon: 2.24× at the gate's |cos| ≥ 0.4, 1.58× at 0.5,
    * 1.14× (one pair in 28) at 0.6, with exact-pair support ending
    * before the cos ≥ 0.85 design regime on that corpus. AT the
    * design regime the claim is now measured directly (round 11,
    * `graft.Audit ivf-recall-planted`, 100 planted ≥0.97-cosine clone
    * pairs in the sf1 corpus): derived k recalls 100/100
    * (1 000 000 ppm) where fixed k = 16 recalls 65/100 (650 000 ppm)
    * — the derivation GAINS tight-regime recall, it does not trade
    * it. Tight near-duplicates concentrate within clusters (the
    * SemDeDup operating assumption), so the default trades no
    * measurable tight-regime recall for its ~3× wall saving; retune
    * `targetOccupancy` only with [[Dedup.semanticIvfAudit]] run at
    * YOUR decision threshold. */
  def nClustersFor(n: Long, targetOccupancy: Int = 128): Int = {
    require(n >= 0 && targetOccupancy >= 1,
      "need n >= 0 and targetOccupancy >= 1")
    // overflow-safe ceiling division (n + occ - 1 wraps near Long.Max)
    val k = n / targetOccupancy + (if (n % targetOccupancy == 0) 0L else 1L)
    math.max(1L, math.min(k, 1L << 16)).toInt
  }

  /** Bands needed to hold `targetRecall` for pairs at the DESIGN
    * similarity when each band ANDs `bitsPerBand` sign bits: per-band
    * collision p = c^bits with c = 1 − acos(designCos)/π (the classic
    * random-hyperplane collision probability), overall recall
    * 1 − (1−p)^bands ⇒ bands = ceil(ln(1−R) / ln(1−p)). At the
    * defaults (cos 0.85 — the regime where banded semantic dedup earns
    * its shape, R = 0.99) this yields exactly 8 bands at 4 bits — the
    * shipped fixed default — and 20 bands at 8 bits, so raising bits
    * for occupancy keeps design-point recall instead of silently
    * trading it away. StrictMath throughout: the derivation is
    * platform-deterministic. */
  def bandsFor(bitsPerBand: Int, designCos: Double = 0.85,
               targetRecall: Double = 0.99): Int = {
    require(bitsPerBand >= 1 && designCos > -1.0 && designCos < 1.0 &&
      targetRecall > 0.0 && targetRecall < 1.0, "bad banding design point")
    val c = 1.0 - StrictMath.acos(designCos) / StrictMath.PI
    val p = StrictMath.pow(c, bitsPerBand.toDouble)
    math.max(1, math.ceil(
      StrictMath.log(1.0 - targetRecall) / StrictMath.log(1.0 - p)).toInt)
  }

  /** Resolve (bands, bitsPerBand) where 0 means "derive from the
    * corpus count": bits from [[bitsFor]] (occupancy), bands from
    * [[bandsFor]] (design-point recall). `n` is only evaluated (one
    * cheap ids-only count) when a knob is actually 0, so explicit
    * callers — the correctness gates, whose static oracles pin a
    * plane count — pay nothing. */
  private[ext] def resolveBanding(bands: Int, bitsPerBand: Int,
                                  n: => Long): (Int, Int) =
    if (bands > 0 && bitsPerBand > 0) (bands, bitsPerBand)
    else {
      val bits = if (bitsPerBand > 0) bitsPerBand else bitsFor(n)
      val b = if (bands > 0) bands else bandsFor(bits)
      (b, bits)
    }

  /** DuckDB CTE `pl(p, comp)` deriving the identical plane matrix:
    * same md5 input strings, same first-6-hex-digit integer, same
    * division — exact integer arithmetic below 2^53 keeps every
    * intermediate double exact, so the components match Scala's
    * bit-for-bit. */
  def planesCteSql(nPlanes: Int, dim: Int): String =
    s"""pl AS (
       |  SELECT p, [ list_reduce([ (strpos('0123456789abcdef',
       |        substr(md5(p::VARCHAR || ':' || (i-1)::VARCHAR), j, 1)) - 1)
       |        * pow(16, 6 - j) for j in range(1, 7) ], (x, y) -> x + y)
       |      / 16777216.0 - 0.5 for i in range(1, ${dim + 1}) ] AS comp
       |  FROM (SELECT unnest(range(0, $nPlanes)) AS p))""".stripMargin

  /** DuckDB CTE `dots(vec_id, p, dot)`: per-(vector, plane) dot with
    * the same left-to-right double fold as [[graft.functions.DotProduct]]. */
  def dotsCteSql(table: String, id: String, vec: String, dim: Int): String =
    s"""dots AS (
       |  SELECT e.$id AS vec_id, pl.p,
       |    list_reduce([ CAST(e.$vec[i] AS DOUBLE) * pl.comp[i]
       |      for i in range(1, ${dim + 1}) ], (x, y) -> x + y) AS dot
       |  FROM $table e CROSS JOIN pl)""".stripMargin
}
