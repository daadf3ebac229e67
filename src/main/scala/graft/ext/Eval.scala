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

  import IntMath.{floorDiv, ppmDiv}

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
        floorDiv((n * diff * diff).cast("decimal(38,0)") * lit(1000L), den))
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
        floorDiv(lit(buckets.toLong) * (col("_r2") - 1), lit(2L) * col("_n")))
      .groupBy(col("bucket"))
      .agg(sum(col("_c")).as("n"), sum(col("_p")).as("n_pos"),
        first(col("_n")).as("_tn"), first(col("_np")).as("_tp"))
      .select(col("bucket"), col("n"), col("n_pos"),
        ppmDiv(col("n_pos"), col("n")).as("rate_ppm"),
        when(col("_tp") > 0,
          floorDiv(col("n_pos").cast("decimal(38,0)") * col("_tn")
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
        floorDiv(col("_ssum"), col("n")).as("conf_ppm"),
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
}
