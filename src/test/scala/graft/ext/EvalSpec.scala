package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aucExact matches the hand-computed midrank AUC (with ties)") {
    // scores ascending: 1-,1+,2-,2+,2+,3+  → n+=4, n-=2
    // midranks: value1→1.5, value2→4, value3→6
    // R+ = 1.5 + 4 + 4 + 6 = 15.5 ; U = 15.5 - 4*5/2 = 5.5 ; AUC = 5.5/8
    val df = Seq((1, false), (1, true), (2, false), (2, true), (2, true),
      (3, true)).toDF("s", "y").repartition(3)
    val r = Eval.aucExact(df, $"s", $"y").collect().head
    assert(r.getAs[Long]("n_pos") == 4L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_num") == 11L)   // 2*15.5 - 4*5 = 31 - 20
    assert(r.getAs[Long]("auc_den") == 16L)
    assert(r.getAs[Long]("auc_ppm") == 687500L)
  }

  test("aucExact: perfect, inverted, and degenerate separations") {
    val perfect = Seq((1, false), (2, false), (3, true), (4, true))
      .toDF("s", "y")
    val p = Eval.aucExact(perfect, $"s", $"y").collect().head
    assert(p.getAs[Long]("auc_num") == p.getAs[Long]("auc_den"))
    val inverted = Eval.aucExact(perfect, $"s", !$"y").collect().head
    assert(inverted.getAs[Long]("auc_num") == 0L)
    // single-class input → null ppm, zero denominator, no crash
    val onlyPos = Eval.aucExact(perfect.filter($"y"), $"s", $"y")
      .collect().head
    assert(onlyPos.getAs[Long]("auc_den") == 0L)
    assert(onlyPos.isNullAt(onlyPos.fieldIndex("auc_ppm")))
  }

  test("aucExact equals the probability a random +,- pair is ordered") {
    // brute-force check on a pseudo-random frame: AUC*den must equal
    // #(pos>neg)*2 + #(pos==neg) over all pos×neg pairs
    val df = spark.range(200).select(
      pmod(xxhash64($"id"), lit(13)).as("s"),
      (pmod(xxhash64($"id" + 7), lit(3)) === 0).as("y"))
      .localCheckpoint()
    val rows = df.collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val num = pos.map(p => neg.map(n =>
      if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
    val r = Eval.aucExact(df, $"s", $"y").collect().head
    assert(r.getAs[Long]("auc_num") == num)
    assert(r.getAs[Long]("auc_den") == 2L * pos.length * neg.length)
  }

  test("calibrationBins: exact per-bin confidence, accuracy, gap") {
    val df = Seq(
      (100000L, false), (150000L, true),             // bin 0 (of 5)
      (900000L, true), (950000L, true), (1000000L, true) // bin 4 (1e6 folds in)
    ).toDF("p", "y")
    val out = Eval.calibrationBins(df, $"p", $"y", bins = 5)
      .orderBy($"bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 4L))
    val b0 = out(0)
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Long]("n_pos") == 1)
    assert(b0.getAs[Long]("conf_ppm") == 125000L)
    assert(b0.getAs[Long]("acc_ppm") == 500000L)
    assert(b0.getAs[Long]("gap_num") == math.abs(1L * 1000000L - 250000L))
    val b4 = out(1)
    assert(b4.getAs[Long]("n") == 3 && b4.getAs[Long]("n_pos") == 3)
    assert(b4.getAs[Long]("gap_num") == math.abs(3000000L - 2850000L))
  }

  test("cohenKappa matches the textbook 2x2 example") {
    // classic: a=20 yes/yes, b=5 yes/no, c=10 no/yes, d=15 no/no
    // po=35/50, pe=(25*30 + 25*20)/2500=0.5, kappa=(0.7-0.5)/0.5=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b").repartition(4), $"a", $"b")
      .collect().head
    assert(r.getAs[Long]("n") == 50 && r.getAs[Long]("diag") == 35)
    assert(r.getAs[Long]("expected_num") == 25L * 30 + 25L * 20)
    assert(r.getAs[Long]("kappa_num") == 50L * 35 - 1250L)
    assert(r.getAs[Long]("kappa_den") == 2500L - 1250L)
    assert(r.getAs[Long]("kappa_ppm") == 400000L)
  }

  test("cohenKappa: perfect agreement, disjoint vocabularies, nulls") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("x", "y")
    val p = Eval.cohenKappa(perfect, $"x", $"y").collect().head
    assert(p.getAs[Long]("kappa_ppm") == 1000000L)
    // annotators never use the same category → pe=0, kappa = po = 0
    val disjoint = Seq(("a", "b"), ("c", "d")).toDF("x", "y")
    val dj = Eval.cohenKappa(disjoint, $"x", $"y").collect().head
    assert(dj.getAs[Long]("expected_num") == 0L && dj.getAs[Long]("kappa_num") == 0L)
    // nulls agree only with nulls (null-safe equality)
    val nulls = Seq((Some("a"), Some("a")), (None, None), (Some("b"), None))
      .toDF("x", "y")
    val nv = Eval.cohenKappa(nulls, $"x", $"y").collect().head
    assert(nv.getAs[Long]("diag") == 2L)
  }

  test("cohenKappa: negative kappa truncates like DuckDB's // (not floor)") {
    // systematic disagreement: po=0, pe=1/2 → kappa = -1
    val rows = Seq(("y", "n"), ("n", "y")).toDF("a", "b")
    val r = Eval.cohenKappa(rows.toDF("a", "b"), $"a", $"b").collect().head
    assert(r.getAs[Long]("kappa_num") == -2L && r.getAs[Long]("kappa_den") == 2L)
    assert(r.getAs[Long]("kappa_ppm") == -1000000L)
    // a non-divisible negative fraction must truncate TOWARD ZERO —
    // DuckDB's integer `//` truncates (SELECT (-7)//2 → -3), so the
    // engine mirrors that, NOT Python-style floor
    // num = 3·0 − 2 = −2, den = 9 − 2 = 7: −2·10⁶/7 = −285714.28…
    // → trunc −285714 (floor would give −285715)
    val rows2 = Seq(("a", "c"), ("a", "c"), ("b", "a")).toDF("a", "b")
    val r2 = Eval.cohenKappa(rows2, $"a", $"b").collect().head
    val num = r2.getAs[Long]("kappa_num"); val den = r2.getAs[Long]("kappa_den")
    assert(num == -2L && den == 7L)
    assert(num * 1000000L % den != 0L) // the case where the two differ
    assert(r2.getAs[Long]("kappa_ppm") == -285714L)
  }

  test("retrievalEval: MRR / hits@k / recall@k per query") {
    val ranked = Seq(
      ("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
      ("q2", "d4", 1), ("q2", "d5", 2),
      ("q3", "d6", 1)).toDF("q", "d", "rk")
    val rels = Seq(
      ("q1", "d2"), ("q1", "d3"), ("q1", "d9"),  // first hit rank 2; d9 never ranked
      ("q2", "d4"),
      ("q3", "d7")                                // nothing relevant ranked
    ).toDF("q", "d")
    val out = Eval.retrievalEval(ranked, "q", "d", "rk", rels, "q", "d", k = 2)
      .orderBy($"query_id").collect()
    val q1 = out(0)
    assert(q1.getAs[Long]("first_rel_rank") == 2L)
    assert(q1.getAs[Long]("rr_ppm") == 500000L)
    assert(q1.getAs[Long]("hits_k") == 1L && q1.getAs[Long]("n_rel") == 3L)
    assert(q1.getAs[Long]("recall_ppm") == 333333L)
    val q2 = out(1)
    assert(q2.getAs[Long]("rr_ppm") == 1000000L && q2.getAs[Long]("recall_ppm") == 1000000L)
    val q3 = out(2)
    assert(q3.isNullAt(q3.fieldIndex("first_rel_rank")))
    assert(q3.getAs[Long]("rr_ppm") == 0L && q3.getAs[Long]("hits_k") == 0L)
  }

  test("fixedKPerGroup: exact k per group, deterministic, salt-sensitive") {
    val df = spark.range(500).select(
      $"id", pmod($"id", lit(7)).as("g")).localCheckpoint()
    val s1 = Sampling.fixedKPerGroup(df, "g", "id", k = 10, salt = "s1")
    val got = s1.groupBy("g").agg(count(lit(1)).as("n")).collect()
    assert(got.length == 7 && got.forall(_.getAs[Long]("n") == 10L))
    assert(s1.agg(max("sample_rank")).collect().head.getLong(0) == 10L)
    // same salt → identical panel; different salt → different panel
    val again = Sampling.fixedKPerGroup(df, "g", "id", 10, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == s1.select("id").collect().map(_.getLong(0)).toSet)
    val other = Sampling.fixedKPerGroup(df, "g", "id", 10, "s2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again != other)
    // groups smaller than k return whole group
    val tiny = Sampling.fixedKPerGroup(df.filter($"id" < 3), "g", "id", 10, "s")
    assert(tiny.count() == 3)
  }

  test("decileLift: hand bands, perfect separation, tie cohesion") {
    // scores desc (10,9,8,7) labels (1,1,0,0), 2 bands → top band all
    // positive (lift 2×), bottom band zero
    val df = Seq((10L, 1), (9L, 1), (8L, 0), (7L, 0)).toDF("s", "y")
      .repartition(3)
    val got = Eval.decileLift(df, col("s"), col("y") === 1, buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 1000000L, 2000000L),
      (1L, 2L, 0L, 0L, 0L)))
    // tied scores stay in ONE band: (5,5,5,1) → band0 gets all three 5s
    val tied = Seq((5L, 1), (5L, 0), (5L, 1), (1L, 0)).toDF("s", "y")
    val g2 = Eval.decileLift(tied, col("s"), col("y") === 1, buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(g2.toSeq == Seq((0L, 3L, 2L, 1333333L), (1L, 1L, 0L, 0L)))
  }

  test("bootstrapCI: constant column degenerates to a point interval") {
    val df = spark.range(100).selectExpr("id AS k", "7 AS x")
    val r = Eval.bootstrapCI(df, col("k"), col("x"), reps = 40,
      salt = "t").collect().head
    assert(r.getAs[Long]("reps") == 40L && r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("mean_ppm") == 7000000L)
    assert(r.getAs[Long]("lo_ppm") == 7000000L)
    assert(r.getAs[Long]("hi_ppm") == 7000000L)
  }

  test("bootstrapCI: ordered interval brackets the mean, repartition-stable") {
    val df = spark.range(200).selectExpr("id AS k", "id % 13 AS x")
    def run(parts: Int) = Eval.bootstrapCI(df.repartition(parts),
      col("k"), col("x"), reps = 80, salt = "s1").collect().head
    val a = run(1); val b = run(7)
    assert(a.toSeq == b.toSeq) // hash-deterministic under partitioning
    val (lo, hi, m) = (a.getAs[Long]("lo_ppm"), a.getAs[Long]("hi_ppm"),
      a.getAs[Long]("mean_ppm"))
    assert(lo <= hi && lo <= m && m <= hi)
    assert(lo > 0L && hi < 12L * 1000000L)
  }

  test("bootstrapCI: empty input yields NULL bounds, not an index error") {
    // all replicates drop when the input is empty — element_at must
    // not be reached with index 0 (r6 advisor finding)
    val df = spark.range(10).filter($"id" < 0)
      .selectExpr("id AS k", "id AS x")
    val r = Eval.bootstrapCI(df, col("k"), col("x"), reps = 20,
      salt = "e").collect().head
    assert(r.getAs[Long]("n") == 0L)
    assert(r.isNullAt(r.fieldIndex("lo_ppm")))
    assert(r.isNullAt(r.fieldIndex("hi_ppm")))
  }

  test("majorityVote: quorum gates the label, ties break low, nulls sit out") {
    val df = Seq(
      (1L, Some("a"), Some("a"), Some("b")),
      (2L, Some("a"), Some("b"), Some("c")),
      (3L, Some("a"), Some("b"), None),
      (4L, Option.empty[String], None, None))
      .toDF("id", "l1", "l2", "l3")
    val got = df.select($"id",
        Eval.majorityVote(Seq($"l1", $"l2", $"l3"), 600000L).as("mv"))
      .select($"id", $"mv.*")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString.toLong),
        Option(r.getString(4))))).toMap
    assert(got(1L) == ((3L, Some("a"), Some(666666L), Some("a"))))
    assert(got(2L) == ((3L, Some("a"), Some(333333L), None))) // 1-1-1 tie
    assert(got(3L) == ((2L, Some("a"), Some(500000L), None))) // under quorum
    assert(got(4L) == ((0L, None, None, None)))               // all abstain
  }

  test("rankBiasedOverlap: identical, swapped and disjoint rankings") {
    def ranked(items: Seq[Long]) = items.zipWithIndex
      .map { case (i, p) => (i, (p + 1).toLong) }.toDF("item", "rank")
    val k = 10
    val weights = Seq.iterate(1000000000000000000L, k)(w => w * 9 / 10)
    // identical lists: inter_d = d at every depth → S = Σ w_d
    val same = Eval.rankBiasedOverlap(ranked(1L to 10L), ranked(1L to 10L),
      "item", "rank", k).collect().head
    assert(same.getAs[Long]("n_joint") == 10L)
    assert(same.getAs[Long]("rbo_ppm") == weights.sum / 10000000000000L)
    // two items, swapped order: inter = (0, 2) → S = w₂ → 0.09 → 90000
    val ab = ranked(Seq(1L, 2L)); val ba = ranked(Seq(2L, 1L))
    val sw = Eval.rankBiasedOverlap(ab, ba, "item", "rank", k = 2)
      .collect().head
    assert(sw.getAs[Long]("rbo_ppm") == 90000L)
    // disjoint lists
    val dj = Eval.rankBiasedOverlap(ranked(1L to 5L), ranked(11L to 15L),
      "item", "rank", k = 5).collect().head
    assert(dj.getAs[Long]("n_joint") == 0L && dj.getAs[Long]("rbo_ppm") == 0L)
  }

  test("ndcgAtK: hand-computed graded example") {
    // w(1)=1000000, w(2)=630929, w(3)=500000 (⌊10⁶/log₂(r+1)⌋)
    val w = Eval.ndcgWeightsPpm(3)
    assert(w == Seq(1000000L, 630929L, 500000L))
    // query 1: ranked docs a,b,c; gains a=1, c=2 (b unjudged → 0)
    val ranked = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L))
      .toDF("q", "doc", "rank")
    val rels = Seq((1L, "a", 1L), (1L, "c", 2L), (1L, "d", 3L))
      .toDF("q", "doc", "gain")
    val r = Eval.ndcgAtK(ranked, "q", "doc", "rank", rels, "q", "doc",
      "gain", k = 3).collect().head
    // dcg = 1·w1 + 2·w3 = 2000000
    // ideal order d(3), c(2), a(1): idcg = 3·w1 + 2·w2 + 1·w3 = 4761858
    assert(r.getAs[Long]("dcg_scaled") == 2000000L)
    assert(r.getAs[Long]("idcg_scaled") == 4761858L)
    assert(r.getAs[Long]("ndcg_ppm") == 2000000L * 1000000L / 4761858L)
    // query with judged rels but nothing ranked: dcg 0, ndcg 0
    val r2 = Eval.ndcgAtK(ranked.filter(lit(false)), "q", "doc", "rank",
      rels, "q", "doc", "gain", k = 3).collect().head
    assert(r2.getAs[Long]("dcg_scaled") == 0L &&
      r2.getAs[Long]("ndcg_ppm") == 0L)
  }

  test("fleissKappa: hand-computed 2-rater case + drop accounting") {
    // items A:(1,1) B:(1,2) C:(2,2) → κ = 1/3; item D has 3 ratings
    // (≠ n=2) and must be dropped and counted
    val df = Seq(("A", 1), ("A", 1), ("B", 1), ("B", 2), ("C", 2),
      ("C", 2), ("D", 1), ("D", 1), ("D", 2)).toDF("item", "label")
    val r = Eval.fleissKappa(df, "item", "label", n = 2).collect().head
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Long]("n_dropped_items") == 1L)
    assert(r.getAs[Long]("sum_sq_counts") == 10L)     // 4 + 2 + 4
    assert(r.getAs[Long]("sum_sq_marginals") == 18L)  // 3² + 3²
    assert(r.getAs[Long]("kappa_ppm") == 333333L)     // (2/3−1/2)/(1/2)
    // perfect agreement → κ undefined only when Pe=1; here κ=1
    val perfect = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2))
      .toDF("item", "label")
    val p = Eval.fleissKappa(perfect, "item", "label", n = 2).collect().head
    assert(p.getAs[Long]("kappa_ppm") == 1000000L)
  }
}
