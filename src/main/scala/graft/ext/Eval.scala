package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Model- and label-quality evaluation metrics, exact.
  *
  * A training-data pipeline ends in numbers that decide what ships:
  * the quality-classifier's AUC, its calibration error, agreement
  * between two labeling passes, and whether retrieval surfaces the
  * right documents. These metrics are usually computed by collecting
  * scores to one machine; every operator here instead keeps the work
  * distributed and the arithmetic in exact integer fractions (the
  * metric's numerator and denominator as BIGINT, plus a ppm
  * rendering), so two engines — or two runs on different cluster
  * layouts — produce bit-identical results.
  *
  * Scale shapes: AUC reduces the corpus to its distinct-score spine
  * (a map-combined groupBy) before ranking, and ranks that spine with
  * [[Prefix.globalRunningSums]] (range exchange + per-partition
  * offsets) — never a single-reducer window. Calibration and kappa
  * are one map-combined contingency aggregation each. Retrieval eval
  * is a per-query bounded aggregation over an already-ranked frame.
  */
object Eval {

  import IntMath.{truncDiv, ppmDiv}

  /** Cumulative Poisson(1) pmf quantized to ppm — the deterministic
    * bootstrap's resampling law. A row's multiplicity in replicate r
    * is the count of thresholds ≤ its 24-bit digest draw mod 10⁶
    * (weights 0–7; the truncated tail past 7 holds 84 ppm of mass). */
  val PoissonCumPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** Deterministic Poisson-bootstrap confidence interval for a mean —
    * "the average document length moved 3%: is that inside this
    * corpus's sampling noise?" answered with NO random number
    * generator: replicate r resamples each row with multiplicity
    * drawn from the ppm-quantized Poisson(1) pmf ([[PoissonCumPpm]])
    * evaluated on md5(salt:r:key), the standard streaming/distributed
    * bootstrap approximation of multinomial resampling (independent
    * per-row counts, E[w]=1). Same salt ⇒ same replicates on any
    * engine, partitioning, or retry.
    *
    * Replicate means are exact integer fractions rendered in ppm of
    * the value's unit (truncating division, the oracle's `//`); the interval is the EXACT
    * order statistic at ranks ⌊reps·tail‰/1000⌋ and reps+1−that —
    * no interpolation, no float quantiles.
    *
    * Scale shape: the explode is rows×reps but never leaves the scan
    * stage — the groupBy(replicate) is map-side combined, so the
    * shuffle carries parts×reps partial rows (reps ≤ 10⁴ bounded).
    * Order statistics come from ONE collect_list over reps 2-long
    * structs (bounded metadata, sketch-sized) — no global-sort
    * window, no driver collect of data rows. */
  def bootstrapCI(df: DataFrame, key: Column, value: Column, reps: Int,
                  salt: String, tailPermille: Int = 25): DataFrame = {
    require(reps >= 4 && reps <= 10000, "reps must be in [4, 10000]")
    require(tailPermille >= 1 && tailPermille * 2 < 1000,
      "tailPermille must be in [1, 499]")
    val digest = md5(concat_ws(":", lit(salt), col("_r"), col("_k"))
      .cast("binary"))
    val u = pmod(conv(substring(digest, 1, 6), 16, 10).cast("long"),
      lit(1000000L))
    val w = PoissonCumPpm.map(c => when(u >= c, 1L).otherwise(0L))
      .reduce(_ + _)
    val repMeans = df
      .select(key.cast("string").as("_k"), value.cast("long").as("_x"),
        explode(sequence(lit(0), lit(reps - 1))).as("_r"))
      .withColumn("_w", w)
      .groupBy(col("_r"))
      .agg(sum(col("_w") * col("_x")).as("_s"), sum(col("_w")).as("_n"))
      // a replicate that resampled NOTHING (all weights 0 — only
      // plausible for tiny inputs) has no mean: drop it rather than
      // let a NULL struct sort first and shift the order statistics
      .filter(col("_n") > 0)
      .select(col("_r"), ppmDiv(col("_s"), col("_n")).as("_m"))
    // rank against the SURVIVING replicate count (== reps except on
    // tiny inputs where zero-weight replicates were dropped): with
    // the nominal reps-based ranks, a shorter list made element_at
    // return a NULL hi_ppm and shifted the tail coverage
    val stats = repMeans
      .agg(sort_array(collect_list(struct(col("_m"), col("_r")))).as("_ms"))
      .select(
        greatest(lit(1),
          size(col("_ms")) * lit(tailPermille) / lit(1000)).cast("int")
          .as("_lo"),
        col("_ms"))
      // an empty replicate list (empty input, or every replicate
      // dropped above) has no order statistics: emit NULL bounds
      // rather than let element_at(_ms, 0) throw on the hi index
      .select(
        when(size(col("_ms")) > 0,
          element_at(col("_ms"), col("_lo")).getField("_m")).as("lo_ppm"),
        when(size(col("_ms")) > 0,
          element_at(col("_ms"),
            (size(col("_ms")) + 1 - col("_lo")).cast("int"))
            .getField("_m")).as("hi_ppm"))
    df.agg(count(lit(1)).as("n"),
        ppmDiv(sum(value.cast("long")), count(lit(1))).as("mean_ppm"))
      .crossJoin(broadcast(stats))
      .select(lit(reps.toLong).as("reps"), col("n"), col("mean_ppm"),
        col("lo_ppm"), col("hi_ppm"))
  }

  /** Majority-vote label merge with abstention — the weak-supervision
    * baseline (Snorkel's starting label model) for fusing k noisy
    * labelers into one training label: per row, the most-voted
    * non-null label wins (ties to the lexicographically smallest —
    * total, engine-portable order), and rows whose winning share
    * misses `quorumPpm` get NULL (abstain) rather than a coin-flip
    * label that would poison training. Returns a struct
    * (n_votes, winner, share_ppm, label).
    *
    * Pure in-row Column expression — scan speed over any corpus, no
    * shuffle; null labeler outputs simply don't vote. */
  def majorityVote(labels: Seq[Column], quorumPpm: Long): Column = {
    require(labels.nonEmpty, "at least one labeler")
    require(quorumPpm >= 0 && quorumPpm <= 1000000L,
      "quorumPpm must be in [0, 10^6]")
    val votes = filter(array(labels.map(_.cast("string")): _*),
      v => v.isNotNull)
    val dts = array_sort(array_distinct(votes))
    val cnts = transform(dts, l => size(filter(votes, x => x === l)))
    val mx = array_max(cnts)
    val winner = element_at(dts, array_position(cnts, mx).cast("int"))
    val share = truncDiv(mx.cast("long") * lit(1000000L), size(votes))
    struct(
      size(votes).cast("long").as("n_votes"),
      winner.as("winner"),
      share.as("share_ppm"),
      when(size(votes) > 0 && share >= quorumPpm, winner).as("label"))
  }

  /** Rank-biased overlap (Webber/Moffat/Zobel) between two top-`k`
    * rankings — "how much did the index rebuild / new embedding model
    * actually change what retrieval surfaces", weighted so rank-1
    * disagreement matters most: RBO = (1−p)·Σ_d p^(d−1)·|A_d∩B_d|/d.
    *
    * Exactly reproducible with NO float pow: the geometric weights
    * are the integer recurrence w₁ = 10¹⁸, w_{d+1} = ⌊w_d·pNum/pDen⌋
    * (computed once, k bounded values), each depth contributes
    * ⌊w_d·inter_d/d⌋, and the final statistic is one truncating division —
    * a ppm-quantized RBO whose spec is pure integer arithmetic, so
    * both engines land on the identical number.
    *
    * Scale shape: the rankings are already top-k (build them with
    * [[graft.functions.TopKAgg]], never a global window); everything
    * here is k-bounded — one equi-join of two ≤ k-row frames, one
    * explode to ≤ k² depth rows, map-combined counts, 1-row crossed
    * broadcasts. Depth overlap counts come from exploding each joint
    * item's depth range d ≥ max(rank_a, rank_b) — an equi-groupBy,
    * NOT an inequality join (no nested-loop plan at any size). */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, item: String,
                        rank: String, k: Int, pNum: Int = 9,
                        pDen: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    require(pNum >= 1 && pNum < pDen && pDen <= 10,
      "need 1 <= pNum < pDen <= 10")
    val weights = Seq.iterate(1000000000000000000L, k)(w => w * pNum / pDen)
    val wlit = typedLit(weights)
    val ja = a.select(col(item).as("_i"), col(rank).cast("long").as("_ra"))
      .filter(col("_ra") <= k)
    val jb = b.select(col(item).as("_i"), col(rank).cast("long").as("_rb"))
      .filter(col("_rb") <= k)
    val joint = ja.join(jb, Seq("_i"))
      .select(greatest(col("_ra"), col("_rb")).as("_m"))
    val interByDepth = joint
      .select(explode(sequence(col("_m"), lit(k.toLong))).as("_d"))
      .groupBy(col("_d")).agg(count(lit(1)).as("_inter"))
    val s = interByDepth
      .select(truncDiv(
          element_at(wlit, col("_d").cast("int")).cast("decimal(38,0)") *
            col("_inter"), col("_d"))
        .cast("decimal(38,0)").as("_c"))
      .agg(coalesce(sum(col("_c")), lit(0L).cast("decimal(38,0)")).as("_s"))
    joint.agg(count(lit(1)).as("n_joint"))
      .crossJoin(broadcast(s))
      .select(lit(k.toLong).as("k"), col("n_joint"),
        truncDiv(col("_s") * lit((pDen - pNum).toLong),
          lit(pDen.toLong * 1000000000000L)).as("rbo_ppm"))
  }

  /** Exact 2×2 chi-square — the A/B significance primitive ("did the
    * new ingest filter change the purchase rate") as one integer
    * fraction: χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) over the
    * condition × outcome contingency table. DECIMAL(38,0) cross-
    * multiplication end-to-end — the χ² statistic is exact, rendered
    * in milli-units by floor division; compare against 3.841
    * (α = 0.05, 1 dof) off-engine.
    *
    * Plan shape: ONE map-combined conditional aggregate produces all
    * four cells — the corpus is scanned once and only a 1-row frame
    * ever leaves the scan stage. Degenerate margins (an empty row or
    * column) emit null χ². */
  def chiSquare2x2(df: DataFrame, cond: Column, outcome: Column)
      : DataFrame = {
    val cells = df.select(
        when(cond, 1L).otherwise(0L).as("_c"),
        when(outcome, 1L).otherwise(0L).as("_o"))
      .agg(sum(when(col("_c") === 1 && col("_o") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("_c") === 1 && col("_o") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("_c") === 0 && col("_o") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("_c") === 0 && col("_o") === 0, 1L).otherwise(0L)).as("d"))
    def dec(n: String) = col(n).cast("decimal(38,0)")
    val n = dec("a") + dec("b") + dec("c") + dec("d")
    val diff = dec("a") * dec("d") - dec("b") * dec("c")
    val den = (dec("a") + dec("b")) * (dec("c") + dec("d")) *
      (dec("a") + dec("c")) * (dec("b") + dec("d"))
    cells.select(col("a"), col("b"), col("c"), col("d"),
      (n * diff * diff).cast("decimal(38,0)").as("chi2_num"),
      den.cast("decimal(38,0)").as("chi2_den"),
      when(den > 0,
        truncDiv((n * diff * diff).cast("decimal(38,0)") * lit(1000L), den))
        .as("chi2_milli"))
  }

  /** Decile (or any-k) lift table: rows ranked by score DESCENDING,
    * cut into `buckets` equal-population bands by midrank, with each
    * band's positive rate compared against the base rate — the
    * standard "is the top decile of this quality/relevance classifier
    * actually richer" report read before trusting a score for
    * curation cuts. Ties share a band by construction (midrank
    * assignment — a score value can never straddle a cut).
    *
    * Integer-exact: band = ⌊buckets·(rank2−1) / 2n⌋ over the doubled
    * midrank, rate and lift in floor-ppm (lift = rate/base_rate, so
    * 1 000 000 = exactly base rate). Returns one row per non-empty
    * band: (bucket, n, n_pos, rate_ppm, lift_ppm).
    *
    * Plan shape: corpus collapses to its distinct-score spine
    * (map-combined groupBy), cumulative counts via
    * [[Prefix.globalRunningSum]] over the DESCENDING spine (range
    * exchange + offsets, no single-reducer window), one map-combined
    * band aggregation, totals as a 1-row broadcast. */
  def decileLift(df: DataFrame, score: Column, label: Column,
                 buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val rows = df.select(score.cast("long").as("_s"),
      when(label, 1L).otherwise(0L).as("_y"))
    val spine = rows.groupBy("_s")
      .agg(count(lit(1)).as("_c"), sum("_y").as("_p"))
    val ranked = Prefix.globalRunningSum(spine, Seq(col("_s").desc),
      col("_c"), "_cum")
    val totals = ranked.agg(sum(col("_c")).as("_n"), sum(col("_p")).as("_np"))
    ranked.crossJoin(broadcast(totals))
      // rank2 = 2·cumBefore + c + 1 (doubled midrank, score-desc)
      .withColumn("_r2", lit(2L) * (col("_cum") - col("_c")) + col("_c") + 1)
      .withColumn("bucket",
        truncDiv(lit(buckets.toLong) * (col("_r2") - 1), lit(2L) * col("_n")))
      .groupBy(col("bucket"))
      .agg(sum(col("_c")).as("n"), sum(col("_p")).as("n_pos"),
        first(col("_n")).as("_tn"), first(col("_np")).as("_tp"))
      .select(col("bucket"), col("n"), col("n_pos"),
        ppmDiv(col("n_pos"), col("n")).as("rate_ppm"),
        when(col("_tp") > 0,
          truncDiv(col("n_pos").cast("decimal(38,0)") * col("_tn")
            * lit(1000000L), col("n").cast("decimal(38,0)") * col("_tp")))
          .as("lift_ppm"))
  }

  /** Exact ROC AUC by rank-sum (Mann–Whitney U) with midrank tie
    * handling, as an exact integer fraction.
    *
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum of the
    * positives' midranks in the score-ascending ranking. Both halves
    * are computed ×2 to clear the midrank's ½ steps, so `auc_num` /
    * `auc_den` is exact: `auc_num = 2·R⁺ − n⁺(n⁺+1)·… ` — concretely,
    * for each distinct score value with `c` rows (`p` of them
    * positive) and `B` rows strictly below it, every row at the value
    * has midrank `B + (c+1)/2`, so `2·R⁺ = Σ p·(2B + c + 1)`.
    *
    * Plan shape: one map-combined groupBy collapses the corpus to its
    * distinct-score spine (|spine| = distinct scores, not rows); the
    * cumulative-below counts come from [[Prefix.globalRunningSum]]
    * over that spine (range-partitioned two-phase cumsum, no global
    * window); the final reduction is a 1-row aggregate. Nothing
    * corpus-sized is ranked, collected, or moved to one task.
    *
    * Returns one row: `n_pos, n_neg, auc_num, auc_den, auc_ppm`
    * (all BIGINT; `auc_ppm = auc_num·10⁶ div auc_den`, null when a
    * class is empty). `score` is cast to long — scale fractional
    * scores to a fixed-point grid first (ties are handled exactly,
    * so quantization only coarsens, never corrupts, the ranking). */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val rows = df.select(score.cast("long").as("_s"),
      when(label, 1L).otherwise(0L).as("_y"))
    val spine = rows.groupBy("_s")
      .agg(count(lit(1)).as("_c"), sum("_y").as("_p"))
    val ranked = Prefix.globalRunningSum(spine, Seq(col("_s")), col("_c"), "_cum")
    val agg = ranked.agg(
      sum(col("_p")).as("n_pos"),
      sum(col("_c") - col("_p")).as("n_neg"),
      // 2·R⁺: B (strictly-below count) = cum − c
      sum(col("_p") * (lit(2L) * (col("_cum") - col("_c")) + col("_c") + 1L))
        .as("_r2"))
    agg.select(
        col("n_pos"), col("n_neg"),
        (col("_r2") - col("n_pos") * (col("n_pos") + 1L)).as("auc_num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den"))
      .withColumn("auc_ppm",
        when(col("auc_den") > 0L,
          ppmDiv(col("auc_num"), col("auc_den"))))
  }

  /** Calibration profile: fixed-width score bins with exact integer
    * confidence/accuracy and the bin's ECE contribution.
    *
    * `scorePpm` is a predicted probability on the [0, 10⁶] ppm grid.
    * Rows land in `bins` equal-width bins (the 10⁶ endpoint folds
    * into the last bin); per bin the operator reports row count,
    * positive count, mean confidence and positive rate (ppm, floor
    * division), and `gap_num = |n_pos·10⁶ − Σ score|` — the exact
    * numerator of the bin's calibration gap, chosen so that
    * ECE = Σ_b gap_num_b / (N·10⁶) without any per-bin rounding:
    * gap_num / (n_b·10⁶) = |acc_b − conf_b| exactly.
    *
    * Plan shape: bin assignment is a narrow in-row expression; the
    * profile is ONE map-combined groupBy over ≤ `bins` keys. */
  def calibrationBins(df: DataFrame, scorePpm: Column, label: Column,
                      bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 10000, "bins must be in [2, 10000]")
    val b = least(floor(scorePpm.cast("long") * bins / 1000000L),
      lit(bins - 1L)).cast("long")
    df.select(b.as("bin"), scorePpm.cast("long").as("_s"),
        when(label, 1L).otherwise(0L).as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("_y").as("n_pos"),
        sum("_s").as("_ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        truncDiv(col("_ssum"), col("n")).as("conf_ppm"),
        ppmDiv(col("n_pos"), col("n")).as("acc_ppm"),
        abs(col("n_pos") * lit(1000000L) - col("_ssum")).as("gap_num"))
  }

  /** Cohen's kappa between two categorical label columns, exact.
    *
    * κ = (p_o − p_e) / (1 − p_e) with p_o = D/N (observed diagonal
    * agreement) and p_e = Σ_k r_k·c_k / N² (chance agreement from the
    * marginals) — cleared to the integer fraction
    * `kappa_num = N·D − Σ r_k·c_k`, `kappa_den = N² − Σ r_k·c_k`.
    * The inter-annotator agreement gate every labeling pipeline runs
    * before trusting a second model pass or a re-annotation batch.
    *
    * Plan shape: ONE map-combined groupBy builds the contingency
    * table (|A-categories| × |B-categories| rows — label vocabularies,
    * not corpus size); marginals and the final fraction are
    * aggregations over that tiny frame. Null labels count as their
    * own category (agreement only when both null), matching the
    * null-safe equality the contingency join uses.
    *
    * Returns one row: `n, diag, expected_num, kappa_num, kappa_den,
    * kappa_ppm` (null kappa when den = 0, i.e. p_e = 1). */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cont = df.select(a.cast("string").as("_a"), b.cast("string").as("_b"))
      .groupBy("_a", "_b").agg(count(lit(1)).as("_n"))
    val rowM = cont.groupBy("_a").agg(sum("_n").as("_r"))
    val colM = cont.groupBy("_b").agg(sum("_n").as("_c"))
    // Σ_k r_k·c_k over categories present on BOTH sides (absent pairs
    // contribute 0); the join is marginal-sized, broadcast-friendly
    val expected = rowM.join(colM, rowM("_a") <=> colM("_b"))
      .agg(coalesce(sum(col("_r") * col("_c")), lit(0L)).as("_e"))
    val totals = cont.agg(
      sum("_n").as("_N"),
      coalesce(sum(when(col("_a") <=> col("_b"), col("_n"))), lit(0L))
        .as("_D"))
    totals.crossJoin(broadcast(expected))
      .select(col("_N").as("n"), col("_D").as("diag"),
        col("_e").as("expected_num"),
        (col("_N") * col("_D") - col("_e")).as("kappa_num"),
        (col("_N") * col("_N") - col("_e")).as("kappa_den"))
      .withColumn("kappa_ppm",
        when(col("kappa_den") =!= 0L,
          ppmDiv(col("kappa_num"), col("kappa_den"))))
  }

  /** Retrieval quality per query: reciprocal rank of the first
    * relevant hit, hits@k, recall@k — exact integers.
    *
    * `ranked` is a (query, doc, rank) frame (rank 1 = best, e.g. from
    * [[Similarity.bruteForceTopK]] or [[Index.championTopK]]);
    * `rels` is the (query, doc) relevance set. Per query:
    * `first_rel_rank` (null if no relevant doc ranked), `rr_ppm =
    * 10⁶ div first_rel_rank` (0 when none — the standard MRR
    * convention), `n_rel` (total relevant for the query), `hits_k`
    * (relevant docs at rank ≤ k), `recall_ppm = hits_k·10⁶ div
    * n_rel`. Corpus-level MRR/recall are one further 1-row mean over
    * this frame — left to the caller so the per-query diagnostics
    * stay available.
    *
    * Plan shape: one equi-join of the ranked frame against the
    * relevance set on (query, doc) — both sides key-partitioned, the
    * relevance set typically broadcast-sized — then one map-combined
    * per-query aggregation; `n_rel` joins in from its own tiny
    * per-query aggregate. No windows, nothing global. */
  def retrievalEval(ranked: DataFrame, query: String, doc: String,
                    rank: String, rels: DataFrame, rQuery: String,
                    rDoc: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val r = ranked.select(col(query).as("query_id"), col(doc).as("_d"),
      col(rank).cast("long").as("_rk"))
    val rel = rels.select(col(rQuery).as("query_id"), col(rDoc).as("_d"))
      .distinct()
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hit = r.join(rel, Seq("query_id", "_d"))
    val perQ = hit.groupBy("query_id")
      .agg(min("_rk").as("first_rel_rank"),
        sum(when(col("_rk") <= k, 1L).otherwise(0L)).as("hits_k"))
    nRel.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        col("first_rel_rank"),
        coalesce(ppmDiv(lit(1L), col("first_rel_rank")), lit(0L))
          .as("rr_ppm"),
        coalesce(col("hits_k"), lit(0L)).as("hits_k"))
      .withColumn("recall_ppm", ppmDiv(col("hits_k"), col("n_rel")))
  }

  /** Discount table for [[ndcgAtK]]: `⌊10⁶ / log₂(r+1)⌋` for ranks
    * 1..k. Computed ONCE here and embedded as integer literals in both
    * the Spark plan and the DuckDB oracle (via [[ndcgWeightsSqlValues]]),
    * so the gate never compares live transcendental evaluations — the
    * classic cross-engine half-ulp trap. */
  def ndcgWeightsPpm(k: Int): Seq[Long] =
    (1 to k).map(r => (1e6 / (Math.log(r + 1.0) / Math.log(2.0))).toLong)

  /** The same table as a SQL VALUES list `(rank, w_ppm)` for oracle
    * interpolation. */
  def ndcgWeightsSqlValues(k: Int): String =
    ndcgWeightsPpm(k).zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")

  /** NDCG@k per query, integer-exact. `ranked` is (query, doc, rank)
    * (rank 1 = best); `rels` is (query, doc, gain) with non-negative
    * integer gains (graded relevance; absent docs have gain 0).
    *
    *   dcg_scaled  = Σ_{rank ≤ k} gain · w(rank)
    *   idcg_scaled = Σ_{i ≤ k}   gain_(i) · w(i)   (gains sorted desc)
    *   ndcg_ppm    = 10⁶·dcg div idcg               (null if idcg = 0)
    *
    * with w the precomputed [[ndcgWeightsPpm]] discount — every term
    * an integer product, every sum order-independent, so the result
    * is bit-identical on any partitioning and any engine.
    *
    * Plan shape: one equi-join of the top-k ranked rows against the
    * relevance set (both key-partitioned; the relevance set typically
    * broadcast-sized), one map-combined per-query sum for DCG; the
    * ideal ordering is a per-QUERY window over the relevance set
    * (bounded by judgments per query, never global). No collects.
    *
    * QUERY UNIVERSE (the TREC convention, trec_eval's behavior): the
    * output has one row per query IN THE RELEVANCE SET. A query with
    * judgments but no ranked rows IS reported (dcg 0 — the system
    * retrieved nothing relevant); a query with ranked rows but no
    * judgments is EXCLUDED, not scored 0, because without judgments
    * its NDCG is undefined rather than bad. Full-outer-join the
    * ranked query ids afterwards if unjudged queries need surfacing. */
  def ndcgAtK(ranked: DataFrame, query: String, doc: String, rank: String,
              rels: DataFrame, rQuery: String, rDoc: String, gain: String,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    val wMap = typedLit(ndcgWeightsPpm(k).zipWithIndex
      .map { case (w, i) => (i + 1).toLong -> w }.toMap)
    val rel = rels.select(col(rQuery).as("query_id"), col(rDoc).as("_d"),
      col(gain).cast("long").as("_g"))
    val r = ranked.select(col(query).as("query_id"), col(doc).as("_d"),
        col(rank).cast("long").as("_rk"))
      .filter(col("_rk") <= k)
    val dcg = r.join(rel, Seq("query_id", "_d"))
      .groupBy("query_id")
      .agg(sum(col("_g") * element_at(wMap, col("_rk"))).as("dcg_scaled"))
    val iw = Window.partitionBy("query_id")
      .orderBy(col("_g").desc, col("_d").asc)
    val idcg = rel
      .withColumn("_ir", row_number().over(iw).cast("long"))
      .filter(col("_ir") <= k)
      .groupBy("query_id")
      .agg(sum(col("_g") * element_at(wMap, col("_ir"))).as("idcg_scaled"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("idcg_scaled"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"))
      .withColumn("ndcg_ppm",
        when(col("idcg_scaled") > 0,
          ppmDiv(col("dcg_scaled"), col("idcg_scaled"))))
  }

  /** Fleiss' κ — chance-corrected agreement among a FIXED number of
    * raters per item (the multi-annotator generalization of
    * [[cohenKappa]]; label-audit staple when every document gets n
    * independent ratings). Input is one row per (item, rater
    * assignment) with a categorical label; items that do not have
    * exactly `n` ratings are dropped (and counted), per the
    * estimator's definition.
    *
    * Exact integer form: with N items, n raters, n_ic the per-item
    * label counts, m_c = Σ_i n_ic and A = Σ_i Σ_c n_ic²,
    *
    *   P̄  = (A − Nn) / (Nn(n−1))        P_e = Σ_c m_c² / (Nn)²
    *   κ   = (P̄ − P_e) / (1 − P_e)
    *       = ((A − Nn)(Nn)² − Nn(n−1)·Σm²) /
    *         (((Nn)² − Σm²)·Nn(n−1))
    *
    * computed in DECIMAL(38,0) (the 10⁶-scaled numerator of a
    * 3e4-rating corpus needs ~10²⁰ — past BIGINT, inside 128-bit on
    * both engines) and rendered as kappa_ppm = trunc toward zero.
    *
    * Plan shape: one (item, label) count aggregation, one per-item
    * collapse, two 1-row global sums — all map-combined; nothing is
    * ever keyed finer than (item, label). */
  def fleissKappa(ratings: DataFrame, item: String, label: String,
                  n: Int): DataFrame = {
    require(n >= 2, "Fleiss' kappa needs at least 2 raters per item")
    val cnt = ratings.groupBy(col(item).as("_i"), col(label).as("_c"))
      .agg(count(lit(1)).as("_nic"))
    val per = cnt.groupBy("_i")
      .agg(sum(col("_nic")).as("_ni"),
        sum(col("_nic") * col("_nic")).as("_sq"))
    val kept = per.filter(col("_ni") === n.toLong)
    val mc = cnt.join(kept.select("_i"), Seq("_i"))
      .groupBy("_c").agg(sum(col("_nic")).as("_mc"))
    val tot = kept.agg(count(lit(1)).as("n_items"),
        sum(col("_sq")).as("_a"))
      .crossJoin(broadcast(
        mc.agg(sum(col("_mc") * col("_mc")).as("_m2"))))
      .crossJoin(broadcast(
        per.agg(count(lit(1)).as("_all"))))
    val nn = col("n_items").cast("decimal(38,0)") * n
    val a = col("_a").cast("decimal(38,0)")
    val m2 = col("_m2").cast("decimal(38,0)")
    val num = (a - nn) * nn * nn - nn * (n - 1) * m2
    val den = (nn * nn - m2) * nn * (n - 1)
    tot.select(col("n_items"),
      (col("_all") - col("n_items")).as("n_dropped_items"),
      col("_a").as("sum_sq_counts"), col("_m2").as("sum_sq_marginals"),
      when(den =!= 0, truncDiv(num * 1000000L, den)).as("kappa_ppm"))
  }
}
