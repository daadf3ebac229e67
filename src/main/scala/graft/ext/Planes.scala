package graft.ext

import org.apache.spark.sql.Column
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
