package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The oversized-bucket cap and the corpus-aware banding-knob
  * derivation — the round-8 hardening of every banded self/cross
  * candidate generator (semantic dedup, embedding near-dups,
  * MinHash LSH, the Similarity banded paths). */
class PlanesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bitsFor holds expected occupancy: floor 4, +1 bit per corpus doubling") {
    assert(Planes.bitsFor(0L) == 4)
    assert(Planes.bitsFor(500L) == 4)     // gate fixture (sf0.01)
    assert(Planes.bitsFor(2000L) == 4)    // sf0.1 fixture
    assert(Planes.bitsFor(20000L) == 8)   // sf1 ramp set
    assert(Planes.bitsFor(40000L) == 9)
    // occupancy contract: n >> bits <= target (or bits pinned at 16)
    for (n <- Seq(1L, 1000L, 100000L, 10000000L, 1L << 40)) {
      val b = Planes.bitsFor(n)
      assert(b == 16 || (n >> b) <= 128, s"n=$n bits=$b")
      assert(b >= 4 && b <= 16)
    }
    // monotone in n
    val seq = Seq(100L, 10000L, 1000000L, 100000000L).map(Planes.bitsFor(_))
    assert(seq == seq.sorted)
  }

  test("bandsFor reproduces the shipped fixed default at 4 bits and scales for recall") {
    // design point cos 0.85, R = 0.99: the pre-round-8 fixed default
    // (8 bands x 4 bits) is exactly the derived value — auto-banding
    // is a strict generalization, not a behavior change, at gate sizes
    assert(Planes.bandsFor(4) == 8)
    assert(Planes.bandsFor(8) == 20)
    // more bits per band => strictly more bands to hold design recall
    assert(Planes.bandsFor(5) >= Planes.bandsFor(4))
    assert(Planes.bandsFor(12) > Planes.bandsFor(8))
    // derived recall really clears the target at the design point
    for (bits <- 4 to 12) {
      val c = 1.0 - math.acos(0.85) / math.Pi
      val p = math.pow(c, bits.toDouble)
      val recall = 1.0 - math.pow(1.0 - p, Planes.bandsFor(bits).toDouble)
      assert(recall >= 0.99, s"bits=$bits recall=$recall")
    }
  }

  test("cappedSelfPairs: under the cap byte-identical, over it bounded and a subset") {
    // 60 ids all in ONE (band, bucket) — the adversarial hot key
    val hot = (0L until 60L).map(i => (i, 0, 7L)).toDF("_id", "band", "bucket")
    val uncapped = Planes.cappedSelfPairs(hot, maxBucket = 4096)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 60 * 59 / 2) // cap above size => full join
    val capped = Planes.cappedSelfPairs(hot, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    // ns = ceil(60/10) = 6 sub-buckets of ~10 => ~6 * C(10,2) pairs
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size)
    // provable bound: sum over sub-buckets of C(n_s, 2) with
    // sum n_s = 60, ns = 6 is maximized when one sub-bucket holds
    // everything Planes.subHash allows; the md5 split is ~uniform, so
    // allow the loose bound rows * maxBucket
    assert(capped.size <= 60 * 10)
    // determinism: same input, same pairs
    val again = Planes.cappedSelfPairs(hot, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(again == capped)
  }

  test("cappedCrossPairs: census counts both sides; only oversized keys split") {
    val a = (0L until 30L).map(i => (i, 0, 7L)).toDF("id_a", "band", "bucket")
      .unionByName(Seq((100L, 1, 3L)).toDF("id_a", "band", "bucket"))
    val b = (50L until 80L).map(i => (i, 0, 7L)).toDF("id_b", "band", "bucket")
      .unionByName(Seq((200L, 1, 3L)).toDF("id_b", "band", "bucket"))
    val uncapped = Planes.cappedCrossPairs(a, b, maxBucket = 4096)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 30 * 30 + 1) // hot key full cross + small key
    val capped = Planes.cappedCrossPairs(a, b, maxBucket = 12)
      .as[(Long, Long)].collect().toSet
    // hot key splits at ns = ceil(60/12) = 5; the small (1,3) bucket
    // is under the cap and must survive untouched
    assert(capped.contains((100L, 200L)))
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size)
  }

  test("embeddingNearDups auto-banding equals the explicit (8,4) gate knobs at fixture size") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin((i % 7 + 1) * (j + 1) * 0.37)))
    }.toDF("vec_id", "embedding")
    val auto = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.8, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val explicit = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.8,
        bands = 8, bitsPerBand = 4, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == explicit)
    assert(auto.nonEmpty) // i % 7 collisions plant exact duplicates
  }

  test("semanticBandingAudit: exhaustive recall sane; sampled mode = restriction of full audit") {
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(j => math.cos((i % 9 + 1) * (j + 2) * 0.21)))
    }.toDF("vec_id", "embedding")
    def audit(bits: Int) = Dedup.semanticBandingAudit(emb, "vec_id",
        "embedding", cos2Num = 4, cos2Den = 25, bands = 4, bitsPerBand = 4,
        dim = 8, docSampleBits = bits)
      .as[(Long, Long, Long, Long)].head()
    val (ne, nb, nh, rp) = audit(0)
    assert(ne > 0 && nb <= ne && nh == nb) // banded pairs pass the same test
    assert(rp == nh * 1000000L / ne)
    // sampled mode: fewer (or equal) pairs on both sides, hits still = banded
    val (se, sb, sh, _) = audit(2)
    assert(se <= ne && sb <= nb && sh == sb)
  }

  test("semanticDupPairsInt8Across == from-scratch run restricted to cross pairs") {
    // class stride 5 (odd) so duplicate classes SPAN both parities —
    // i and i+5 carry identical vectors on opposite join sides
    val mk = (i: Long) =>
      (i, Array.tabulate(8)(j => math.cos((i % 5 + 1) * (j + 2) * 0.31)))
    val all = (0L until 40L).map(mk).toDF("vec_id", "embedding")
    val newB = all.filter(pmod(col("vec_id"), lit(2)) === 0)
    val hist = all.filter(pmod(col("vec_id"), lit(2)) === 1)
    val across = Dedup.semanticDupPairsInt8Across(newB, hist, "vec_id",
        "embedding", cos2Num = 4, cos2Den = 25, bands = 4, bitsPerBand = 4,
        dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the bit-determinism contract: incremental == full run's pairs
    // restricted to (new, hist), reoriented new-side-first
    val full = Dedup.semanticDupPairsInt8(all, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, bands = 4, bitsPerBand = 4, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = full.collect {
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (a, b)
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (b, a)
    }
    assert(across == expected)
    assert(across.nonEmpty) // i % 6 plants cross-parity duplicates
  }

  test("semanticDupPairsIvfInt8: duplicates cluster and pair; scores match recomputation") {
    val emb = (0L until 48L).map { i =>
      (i, Array.tabulate(8)(j => math.sin((i % 8 + 1) * (j + 1) * 0.29)))
    }.toDF("vec_id", "embedding")
    val rows = Dedup.semanticDupPairsIvfInt8(emb, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, nClusters = 4, rounds = 2)
      .collect()
    assert(rows.nonEmpty)
    // identical vectors (i % 8 collisions) land in one cluster and
    // must pair with cos = 1: dotq^2 == na*nb exactly
    val exactDups = rows.filter(r => r.getLong(0) % 8 == r.getLong(1) % 8)
    assert(exactDups.nonEmpty)
    exactDups.foreach { r =>
      val (dotq, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dotq * dotq == na * nb)
    }
    // every emitted pair passes the integer decision
    rows.foreach { r =>
      val (dotq, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dotq > 0 && 25 * dotq * dotq >= 4 * na * nb)
    }
  }

  test("nClustersFor: occupancy-derived, clamped, deterministic") {
    // k = ceil(n / occ), the same shape as bitsFor's occupancy target
    assert(Planes.nClustersFor(0) == 1)
    assert(Planes.nClustersFor(1) == 1)
    assert(Planes.nClustersFor(128) == 1)
    assert(Planes.nClustersFor(129) == 2)
    assert(Planes.nClustersFor(500) == 4) // the x189 gate corpus
    assert(Planes.nClustersFor(2000) == 16) // sf0.1
    assert(Planes.nClustersFor(1000, targetOccupancy = 100) == 10)
    // ceiling: the broadcast-codebook bound
    assert(Planes.nClustersFor(Long.MaxValue) == (1 << 16))
    intercept[IllegalArgumentException](Planes.nClustersFor(-1))
    intercept[IllegalArgumentException](Planes.nClustersFor(10, 0))
  }

  test("semanticDupPairsIvfInt8: derived nClusters equals the explicit call") {
    val emb = (0L until 48L).map { i =>
      (i, Array.tabulate(8)(j => math.sin((i % 8 + 1) * (j + 1) * 0.29)))
    }.toDF("vec_id", "embedding")
    // 48 vectors → nClustersFor(48) = 1: the corpus-aware default and
    // the explicit k must produce the identical pair set
    val derived = Dedup.semanticDupPairsIvfInt8(emb, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, rounds = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val explicit = Dedup.semanticDupPairsIvfInt8(emb, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, nClusters = 1, rounds = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(derived == explicit && derived.nonEmpty)
  }

  test("semanticIvfAudit: n_hits == n_ivf and recall bounded by construction") {
    val emb = (0L until 48L).map { i =>
      (i, Array.tabulate(8)(j => math.sin((i % 8 + 1) * (j + 1) * 0.29)))
    }.toDF("vec_id", "embedding")
    val r = Dedup.semanticIvfAudit(emb, "vec_id", "embedding",
      cos2Num = 4, cos2Den = 25, nClusters = 4, rounds = 2).collect().head
    val (nExact, nIvf, nHits, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // IVF pairs pass the identical integer decision → subset of exact
    assert(nHits == nIvf && nIvf <= nExact && nExact > 0)
    assert(recall == nHits * 1000000L / nExact)
    // k = 1 is brute force within one cluster: recall must be total
    val full = Dedup.semanticIvfAudit(emb, "vec_id", "embedding",
      cos2Num = 4, cos2Den = 25, nClusters = 1, rounds = 1).collect().head
    assert(full.getLong(3) == 1000000L)
  }

  test("randomProjection: coordinates are exact plane dots; length validated") {
    val vecs = Seq((0L, Array(1.0, 2.0, 3.0, 4.0)),
      (1L, Array(-1.0, 0.5, 0.0, 2.0))).toDF("vec_id", "embedding")
    val planes = Planes.components(2, 4)
    val got = Similarity.randomProjection(vecs, "vec_id", "embedding",
        outDim = 2, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- Seq(0L -> Array(1.0, 2.0, 3.0, 4.0),
                        1L -> Array(-1.0, 0.5, 0.0, 2.0));
         j <- 0 until 2) {
      val expect = v.zip(planes(j)).foldLeft(0.0) { case (a, (x, p)) => a + x * p }
      assert(got(id)(j) == expect, s"id=$id j=$j")
    }
    // wrong dim fails loudly instead of projecting NULLs
    val bad = Seq((9L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    assertThrows[Exception] {
      Similarity.randomProjection(bad, "vec_id", "embedding", 2, 4).collect()
    }
  }

  test("projectionDistortionAudit: duplicate pairs excluded, ppm in a sane band") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(16)(j => math.sin((i % 11 + 1) * (j + 1) * 0.43)))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.projectionDistortionAudit(vecs, "vec_id",
        "embedding", outDim = 8, dim = 16, sampleMod = 1)
      .collect()
    assert(rows.nonEmpty)
    // i % 11 duplicates have d2_true = 0 and must be absent
    val ids = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains((0L, 11L)) && !ids.contains((1L, 12L)))
    // JL with 8 dims is loose but not absurd: all ratios positive,
    // and the MEDIAN within [0.2, 5] of perfect preservation
    val ppm = rows.map(_.getLong(2)).sorted
    assert(ppm.head >= 0)
    val med = ppm(ppm.length / 2)
    assert(med > 200000L && med < 5000000L, s"median=$med")
  }

  test("semanticDupPairsInt8 survives an identical-vector flood under a tiny cap") {
    // 50 byte-identical vectors: every band puts them in one bucket;
    // the cap must sub-split (uniformly, via md5 on the id) instead of
    // pairing quadratically, and every emitted pair still passes the
    // integer cosine test (cos = 1 for identical vectors)
    val emb = (0L until 50L).map(i => (i, Array.fill(8)(0.5)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.semanticDupPairsInt8(emb, "vec_id", "embedding",
        cos2Num = 4, cos2Den = 25, bands = 2, bitsPerBand = 4, dim = 8,
        maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    assert(pairs.size < 50 * 49 / 2) // capped: strictly under full n^2
    // bands = 2 sub-splits with two DIFFERENT band keys over the same
    // ids: pair volume bounded by ~bands * n * maxBucket
    assert(pairs.size <= 2 * 50 * 8)
  }
}
