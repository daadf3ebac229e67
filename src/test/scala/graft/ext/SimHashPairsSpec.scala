package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Gates for the banded SimHash pair join (round-2 verdict item 4;
  * capped round 9): the disjoint-chunk banding must be LOSSLESS
  * within the hamming ball (pigeonhole) wherever no (band, chunk)
  * bucket exceeds `maxBucket`, the candidate volume must stay
  * near-linear on non-duplicate corpora — the property byte-banding
  * lost at scale (N²/2048 candidates) and 16-bit bands restore —
  * and an identical-signature FLOOD (the one hot key banding can't
  * spread) must be bounded by the oversized-bucket sub-split instead
  * of pairing quadratically. */
class SimHashPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("banded pairs == exact hamming pairs on the documents corpus") {
    val sigs = docs
      .select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .as[(Long, Long)].collect()
    val exact = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == exact)
    assert(exact.nonEmpty, "fixture must exercise the ball")
  }

  test("candidate volume stays near-linear on a skewed corpus") {
    // 400 distinct pseudo-random texts plus a 30-doc exact-dup cluster
    // (the skew): true-dup candidates are the output itself; the bound
    // asserts the DISTINCT docs don't cross-pair quadratically.
    val n = 400
    val distinctDocs = (0 until n).map { i =>
      (i.toLong, (0 until 12).map(j => s"tok_${i}_$j").mkString(" "))
    }
    val cluster = (0 until 30).map(i => (1000L + i, "hot dup text payload"))
    val sigs = (distinctDocs ++ cluster).toDF("doc_id", "text")
      .select($"doc_id".as("_id"), Dedup.simhash64($"text").as("sig"))
    val candidates = Dedup.simhashCandidates(sigs, maxHamming = 3).count()
    val clusterPairs = 30L * 29 / 2 // irreducible: these ARE the dups
    val allPairs = (n + 30L) * (n + 29) / 2
    // 4 bands × 65,536 buckets: expected random collisions per band
    // ~ n²/65536 ≈ 2.4 → allow generous slack, still ≪ all-pairs
    assert(candidates >= clusterPairs)
    assert(candidates - clusterPairs < 200,
      s"non-dup candidate leakage too high: ${candidates - clusterPairs}")
    assert(candidates < allPairs / 100)
  }

  test("identical-signature flood: candidates bounded by the sub-split, not quadratic") {
    // 600 docs with the SAME 64-bit signature — the dHash flat-image
    // hot key (or boilerplate that survived exact dedup byte-different).
    // Every doc shares every chunk in every band: uncapped this pairs
    // 600*599/2 = 179,700 times; capped at 64 it must stay near
    // ns * C(600/ns, 2) * ... ≈ n*maxBucket/2 per the volume bound.
    val m = 600
    val sigs = (0 until m).map(i => (i.toLong, 0x5a5a5a5a5a5a5a5aL))
      .toDF("_id", "sig")
    val maxBucket = 64
    val capped = Dedup.simhashCandidates(sigs, maxHamming = 3,
      maxBucket = maxBucket).count()
    val quadratic = m.toLong * (m - 1) / 2
    assert(capped > 0, "sub-buckets must still pair internally")
    assert(capped < quadratic / 2,
      s"flood not bounded: $capped of $quadratic possible pairs")
    // the documented bound: ~n * maxBucket / 2 with slack for uneven
    // md5 sub-bucket occupancy (sum of C(m_i, 2) at E[m_i]=~60)
    assert(capped <= m.toLong * maxBucket,
      s"flood exceeded the n*maxBucket volume bound: $capped")
    // below the cap the generator is byte-identical to the lossless
    // join: the same flood with maxBucket above its size pairs fully
    val uncapped = Dedup.simhashCandidates(sigs, maxHamming = 3,
      maxBucket = 4096).count()
    assert(uncapped == quadratic)
  }

  test("simhashPairsAcross == cross-parity slice of the self pairs, reoriented") {
    val h0 = Dedup.simhashPairsAcross(
        docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = full.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
    }
    assert(h0 == expected)
    assert(h0.nonEmpty, "fixture must have cross-parity near-dups")
  }

  test("hamming=0 band (whole signature) and hamming=7 byte bands still work") {
    val planted = Seq(
      (1L, "alpha bravo charlie delta"),
      (2L, "alpha bravo charlie delta"), // exact dup of 1
      (3L, "totally different words entirely"))
      .toDF("doc_id", "text")
    val h0 = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h0 == Set((1L, 2L)))
    val h7 = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h7.contains((1L, 2L)))
  }
}
