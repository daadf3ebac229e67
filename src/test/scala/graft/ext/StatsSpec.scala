package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int8Gram matches a hand-computed outer-product sum") {
    // per-vector maxabs. v1=[4.0,-2.0]: scale=31.75 → q=[127, floor(-63.0)=-63]
    // v2=[1.0,3.0]: maxabs=3, scale=42.33… → q=[floor(42.83)=42, 127]
    val df = Seq(
      (1L, Seq(4.0f, -2.0f)),
      (2L, Seq(1.0f, 3.0f))).toDF("id", "emb").repartition(2)
    val r = Similarity.int8Gram(df, "emb", dims = 2).collect().head
    assert(r.getAs[Long]("n") == 2L)
    val sums = r.getSeq[Long](r.fieldIndex("sums")).toSeq
    assert(sums == Seq(127L + 42L, -63L + 127L))
    val gram = r.getSeq[Long](r.fieldIndex("gram")).toSeq
    // cells: (0,0)=127²+42², (0,1)=127·(-63)+42·127, (1,0) sym, (1,1)=63²+127²
    assert(gram == Seq(127L * 127 + 42L * 42, 127L * (-63) + 42L * 127,
      (-63L) * 127 + 127L * 42, 63L * 63 + 127L * 127))
    // symmetry of the full matrix
    assert(gram(1) == gram(2))
  }

  test("int8Gram is partitioning-invariant (exact integers)") {
    val df = spark.range(300).select(
      $"id", array((0 until 8).map(i =>
        (pmod(xxhash64($"id" + i), lit(200)) - 100).cast("float") / 10.0f): _*)
        .as("emb")).localCheckpoint()
    val a = Similarity.int8Gram(df.repartition(1), "emb", 8).collect().head
    val b = Similarity.int8Gram(df.repartition(13), "emb", 8).collect().head
    assert(a.getSeq[Long](a.fieldIndex("gram")).toSeq == b.getSeq[Long](b.fieldIndex("gram")).toSeq)
    assert(a.getSeq[Long](a.fieldIndex("sums")).toSeq == b.getSeq[Long](b.fieldIndex("sums")).toSeq)
  }

  test("informationGain: perfectly predictive vs independent features") {
    // X fully determines Y → H(Y|X)=0, IG = H(Y)
    val perfect = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("x", "y")
    val p = Profile.informationGain(perfect, "x", "y").collect().head
    assert(p.getAs[Long]("h_cond_ppm") == 0L)
    assert(p.getAs[Long]("h_label_ppm") == 1000000L) // 2 classes, 50/50 → 1 bit
    assert(p.getAs[Long]("ig_ppm") == 1000000L)
    // X carries nothing: same Y distribution in every X slice → IG = 0
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val i = Profile.informationGain(indep, "x", "y").collect().head
    assert(i.getAs[Long]("h_label_ppm") == 1000000L)
    assert(i.getAs[Long]("h_cond_ppm") == 1000000L)
    assert(i.getAs[Long]("ig_ppm") == 0L)
  }

  test("informationGain quantized-log2 convention matches hand math") {
    // 8 rows: y=u 6 times, y=v 2 times; floor(log2(8//6))=0, floor(log2(8//2))=2
    // H(Y)·N = 6·0 + 2·2 = 4 → h_label_ppm = 4e6//8 = 500000
    val df = Seq.fill(6)(("a", "u")).++(Seq.fill(2)(("a", "v"))).toDF("x", "y")
    val r = Profile.informationGain(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("h_label_ppm") == 500000L)
    // single X category → conditional equals marginal
    assert(r.getAs[Long]("h_cond_ppm") == 500000L)
    assert(r.getAs[Long]("ig_ppm") == 0L)
  }

  test("weightedMedian: exact lower weighted median with ties and skew") {
    val df = Seq(
      ("g1", 10L, 1L), ("g1", 20L, 2L), ("g1", 30L, 1L), // W=4, 2cum: 2,6,8 → 20
      ("g2", 5L, 9L), ("g2", 100L, 1L),                  // heavy head → 5
      ("g3", 7L, 1L)                                      // singleton → 7
    ).toDF("g", "v", "w").repartition(3)
    val got = Profile.weightedMedian(df, "g", col("v"), col("w"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("g1", 4L, 20L), ("g2", 10L, 5L), ("g3", 1L, 7L)))
  }

  test("weightedMedian collapses duplicate values before ranking") {
    // same value split across rows must merge weights: 2·cum at v=1 is 6 ≥ W=6
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 3L)).toDF("g", "v", "w")
    val r = Profile.weightedMedian(df, "g", col("v"), col("w")).collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 1L)
  }

  test("spearmanComponents: perfect monotone / inverse association") {
    val up = Seq((1, 10), (2, 20), (3, 30), (4, 40), (5, 50)).toDF("x", "y")
    val u = Profile.spearmanComponents(up, col("x"), col("y")).collect().head
    // identical rank vectors → num == den_x == den_y (ρ = 1)
    assert(u.getDecimal(1) == u.getDecimal(2) && u.getDecimal(2) == u.getDecimal(3))
    val down = Seq((1, 50), (2, 40), (3, 30), (4, 20), (5, 10)).toDF("x", "y")
    val dn = Profile.spearmanComponents(down, col("x"), col("y")).collect().head
    assert(dn.getDecimal(1).negate() == dn.getDecimal(2)) // ρ = −1
  }

  test("spearmanComponents: tie-corrected average ranks match hand math") {
    // x=(1,2,2,3) → rank2=(2,5,5,8); y=(1,2,3,4) → rank2=(2,4,6,8)
    // n=4: num = 4·118−20·20 = 72, den_x = 72, den_y = 80 (ρ ≈ 0.9487)
    val df = Seq((1, 1), (2, 2), (2, 3), (3, 4)).toDF("x", "y")
      .repartition(3)
    val r = Profile.spearmanComponents(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDecimal(1).longValue == 72L)
    assert(r.getDecimal(2).longValue == 72L)
    assert(r.getDecimal(3).longValue == 80L)
  }

  test("chao1Richness: hand-computed spectrum") {
    // tokens: a·2, b·1, c·1 → n=4, V=3, F1=2, F2=1
    // chao1 = 3e6 + (1e6·2·1)//(2·2) = 3.5e6; unseen = 2e6//4 = 5e5
    val df = Seq("a a b", "c").toDF("text")
    val r = TextAnalysis.chao1Richness(df, "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 2L, 1L)))
    assert(r.getAs[Long]("chao1_ppm") == 3500000L)
    assert(r.getAs[Long]("unseen_mass_ppm") == 500000L)
  }

  test("klDriftBits: quantized log ratios match hand math") {
    // A = x⁴, B = y: V=2, N'A=6, N'B=3
    // x: (5·3)//(1·6)=2 → +1 bit, contrib 5; y: (6·2)//(3·1)=4 → −2, contrib −2
    val a = Seq("x x x x").toDF("text")
    val b = Seq("y").toDF("text")
    val got = Drift.klDriftBits(a, b, "text").orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("x", 4L, 0L, 1L, 5L), ("y", 0L, 1L, -2L, -2L)))
  }

  test("concentration: uniform → Gini 0, monopoly → (n−1)/n, hand case") {
    val eq = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("g", "w")
    val e = Profile.concentration(eq, "g", col("w")).collect().head
    assert(e.getDecimal(2).longValue == 0L)            // gini_num
    assert(e.getAs[Long]("hhi_ppm") == 250000L)        // 1/4
    val mono = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 10L)).toDF("g", "w")
    val m = Profile.concentration(mono, "g", col("w")).collect().head
    assert(m.getAs[Long]("gini_ppm") == 750000L)       // (n−1)/n = 3/4
    assert(m.getAs[Long]("hhi_ppm") == 1000000L)
    // x = (1,2,3,4): G = (2·30 − 5·10)/40 = 1/4, HHI = 30/100
    val mix = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("g", "w")
    val x = Profile.concentration(mix, "g", col("w")).collect().head
    assert(x.getDecimal(2).longValue == 10L && x.getDecimal(3).longValue == 40L)
    assert(x.getAs[Long]("gini_ppm") == 250000L)
    assert(x.getAs[Long]("hhi_ppm") == 300000L)
  }

  test("percentileRank: midrank ppm within each group, ties shared") {
    // group a values (10, 20, 20, 30): midranks 1, 2.5, 2.5, 4 of n=4
    // pct_ppm = ⌊1e6·(2·mid−2)/(2·4)⌋·... = ⌊1e6·(r2−1)/8⌋ → 125000,
    // 500000, 500000, 875000; group b singleton → 500000
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L), ("b", 7L))
      .toDF("g", "v").repartition(3)
    val got = Profile.percentileRank(df, "g", col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(got == Seq(("a", 10L, 125000L), ("a", 20L, 500000L),
      ("a", 20L, 500000L), ("a", 30L, 875000L), ("b", 7L, 500000L)))
  }

  test("quantileMap: hand-matched CDFs, ties, self-map identity") {
    val ref = Seq(1L, 2L, 3L, 4L).toDF("v").repartition(2)
    val src = Seq(10L, 10L, 20L).toDF("v").repartition(3)
    val got = Profile.quantileMap(ref, src, col("v")).orderBy("v_src")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // v=10 (midrank 1.5 of 3 → pct 1/3): first ref cum with 6·cum ≥ 8 → 2
    // v=20 (midrank 3 of 3 → pct 5/6): 6·cum ≥ 20 → cum 4 → ref value 4
    assert(got.toSeq == Seq((10L, 333333L, 2L), (20L, 833333L, 4L)))
    // mapping a distribution onto itself reproduces it (monotone identity)
    val self = Seq(5L, 6L, 6L, 9L).toDF("v")
    val idm = Profile.quantileMap(self, self, col("v")).orderBy("v_src")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(idm.toSeq == Seq((5L, 5L), (6L, 6L), (9L, 9L)))
  }

  test("zipfSlope: hand-computed log2-bucket regression") {
    // tokens: a×8, b×4, c×2, d×1 → ranks 1..4, buckets:
    // (x=log2 rank, y=log2 freq) = (0,3), (1,2), (1,1), (2,0)
    // n=4, Σx=4, Σy=6, Σxx=6, Σxy=3 → num = 4·3−24 = −12, den = 4·6−16 = 8
    // slope = −3/2 (steeper than −1: tiny head-heavy corpus)
    val df = Seq(Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).map(_.mkString(" ")).toDF("text")
    val r = TextAnalysis.zipfSlope(df, "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, -12L, 8L)))
  }

  test("trimmedMean: clean trim, boundary ties trim partially") {
    // 1..10, 20% → k=2, keep 3..8: sum 33, n 6, mean floor 5
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = Profile.trimmedMean(df, "g", col("v"), 200000L).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((10L, 2L, 6L)))
    assert(r.getDecimal(4).longValue == 33L && r.getLong(5) == 5L)
    // (1,5,5,5,9), k=1: the 1 and the 9 go, all three 5s survive
    val tied = Seq(1L, 5L, 5L, 5L, 9L).map(("g", _)).toDF("g", "v")
      .repartition(2)
    val r2 = Profile.trimmedMean(tied, "g", col("v"), 200000L).collect().head
    assert(r2.getLong(3) == 3L && r2.getDecimal(4).longValue == 15L &&
      r2.getLong(5) == 5L)
  }

  test("chiSquare2x2: perfect association, independence, degenerate") {
    val perfect = Seq((true, true), (true, true), (false, false),
      (false, false)).toDF("c", "o")
    val p = Eval.chiSquare2x2(perfect, col("c"), col("o")).collect().head
    // a=2,d=2,b=c=0: χ² = 4·16/(2·2·2·2) = 4 → 4000 milli
    assert(p.getAs[Long]("chi2_milli") == 4000L)
    val indep = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("c", "o")
    val i = Eval.chiSquare2x2(indep, col("c"), col("o")).collect().head
    assert(i.getAs[Long]("chi2_milli") == 0L)
    // empty margin → undefined statistic (den 0 → null milli)
    val degen = Seq((true, true), (true, true)).toDF("c", "o")
    val g = Eval.chiSquare2x2(degen, col("c"), col("o")).collect().head
    assert(g.isNullAt(g.fieldIndex("chi2_milli")))
  }

  test("classTfidf: group-exclusive terms outrank shared ones") {
    val df = Seq(("A", "x x y"), ("B", "z y")).toDF("src", "text")
    val got = TextAnalysis.classTfidf(df, "src", "text", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(5)))
      .toSet
    // x exclusive to A (score 2·1), z exclusive to B (1·1), y shared (0)
    assert(got == Set(("A", 1L, "x", 2L), ("A", 2L, "y", 0L),
      ("B", 1L, "z", 1L), ("B", 2L, "y", 0L)))
  }

  test("klDriftBits of a corpus against itself is zero everywhere") {
    val c = Seq("p q q r", "r r s").toDF("text").repartition(2)
    val got = Drift.klDriftBits(c, c, "text").collect()
    assert(got.nonEmpty && got.forall(r => r.getLong(3) == 0L))
  }

  test("winsorizedMean: clips boundary mass, every row still counts") {
    import org.apache.spark.sql.functions.col
    val df = ((1L to 10L).map(("g", _)) ++ Seq(("h", 1L), ("h", 1L),
      ("h", 1L), ("h", 100L))).toDF("grp", "v").repartition(3)
    val got = Profile.winsorizedMean(df, "grp", col("v"), 250000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValue, r.getLong(4)))).toMap
    // g: n=10, k=2 → 1,2→3 and 9,10→8: 55 −1−2−9−10 +3+3+8+8 = 55
    assert(got("g") == ((10L, 2L, 55L, 5L)))
    // h: n=4, k=1 → the 100 clips to 1 (rank n−k = 3 holds value 1)
    assert(got("h") == ((4L, 1L, 4L, 1L)))
  }

  test("embeddingIsotropy: opposed cloud scores 0, degenerate cloud 10^6") {
    val opposed = Seq(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)).toDF("embedding")
    val r0 = Similarity.embeddingIsotropy(opposed, "embedding", 2)
      .collect().head
    assert(r0.getAs[Long]("mean_offset_ppm") == 0L)
    val same = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)).toDF("embedding")
    val r1 = Similarity.embeddingIsotropy(same, "embedding", 2)
      .collect().head
    // sums = (254, 0) → ‖Σq‖² = 64516; trace = 2·127² = 32258; n = 2
    assert(r1.getDecimal(1).longValue == 64516L)
    assert(r1.getDecimal(2).longValue == 32258L)
    assert(r1.getAs[Long]("mean_offset_ppm") == 1000000L)
  }

  test("jsonKeyProfile: presence and distinct values, malformed dropped") {
    import org.apache.spark.sql.functions.col
    val df = Seq("""{"a": 1, "b": "x"}""", """{"a": 2}""", "not json")
      .toDF("j")
    val got = Profile.jsonKeyProfile(df, col("j"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((2L, 2L)), "b" -> ((1L, 1L))))
  }

  test("langSegments: mixed doc fragments, majority ties break low") {
    import org.apache.spark.sql.functions.col
    val mk = Seq("en" -> Seq("the"), "fr" -> Seq("value"))
    val mixed = (Seq.fill(8)("the") ++ Seq.fill(8)("value")).mkString(" ")
    val pure = Seq.fill(16)("the").mkString(" ")
    val df = Seq((1L, mixed), (2L, pure)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.langSegments(col("text"), 8, mk).as("ls"))
      .select(col("doc_id"), col("ls.*"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))).toMap
    // en chunk + fr chunk: 2 segments, 1:1 tie → 'en' (lexic. smallest)
    assert(got(1L) == ((2L, 2L, "en", 500000L)))
    assert(got(2L) == ((2L, 1L, "en", 1000000L)))
  }

  test("crossSurprisal: add-one smoothing, OOV bits, hand-computed") {
    // reference: a:3 b:1 → total 4, V 2 → smoothed denominator 6
    val train = Seq("a a a b").toDF("text")
    val score = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.crossSurprisal(train, score, "doc_id", "text")
      .collect().head
    // a: 6//4=1 → 0 bits; b: 6//2=3 → 1 bit; c OOV: 6//1=6 → 2 bits
    assert(r.getAs[Long]("n_toks") == 3L && r.getAs[Long]("oov") == 1L)
    assert(r.getAs[Long]("bits_sum") == 3L)
    assert(r.getAs[Long]("surprisal_ppm") == 1000000L)
  }

  test("principalDirection replays the exact BigInt recurrence") {
    // 8 copies of (1,2) plant the dominant axis toward dim 1; one
    // (3,0) keeps the start vector e1 non-orthogonal to it
    val df = (Seq.fill(8)(Seq(1.0f, 2.0f)) :+ Seq(3.0f, 0.0f))
      .toDF("embedding").repartition(3)
    // quantized: (1,2) → (64,127); (3,0) → (127,0)
    val g = Array(
      Array(BigInt(8 * 64 * 64 + 127 * 127), BigInt(8 * 64 * 127)),
      Array(BigInt(8 * 64 * 127), BigInt(8 * 127 * 127)))
    var v = Array(BigInt(1000000), BigInt(0))
    for (_ <- 1 to 3) {
      val w = Array.tabulate(2)(i => (0 until 2).map(j => g(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x => x.abs * 1000000 / mx * x.signum)
    }
    val got = Similarity.principalDirection(df, "embedding", dims = 2)
      .orderBy("dim").collect().map(_.getLong(1))
    assert(got.toSeq == v.map(_.toLong).toSeq)
    // the planted (1,2)-ish axis dominates: |v| peaks at dim 1
    assert(got(1) == 1000000L && math.abs(got(0)) < 1000000L)
  }

  test("burstiness: hand-computed dispersion with zero-count docs") {
    val df = Seq((1L, "a a a"), (2L, "b"), (3L, "b"))
      .toDF("doc_id", "text").repartition(2)
    // a: N=3, Σc=3, Σc²=9 → D=(3·9−9)/(3·3)=2 → 2·10⁶ ppm
    // b: Σc=2, Σc²=2 → (3·2−4)/(3·2)=1/3 → 333333 ppm (floored)
    val m = TextAnalysis.burstiness(df, "doc_id", "text", minTotal = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("a") == ((1L, 3L, 2000000L)))
    assert(m("b") == ((2L, 2L, 333333L)))
  }
}
