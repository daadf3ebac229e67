package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{MapType, StringType}

/** Numeric data profiling.
  *
  * Equi-width histograms are the one-pass profile every ingest
  * pipeline wants before choosing filters/clipping bounds. Shape:
  * a 1-row (min, max) aggregate broadcast back over the scan, then a
  * map-combined bin count — two scans, no sort, no shuffle of data
  * rows. Bin assignment is a fixed dag of IEEE double ops (no
  * accumulation), so bins are engine-exact for any input.
  */
object Profile {

  /** Whole-table column profile: one row per requested column with
    * row count, null count, EXACT distinct count, and min/max (as
    * strings, so one schema fits every column type). The profile every
    * warehouse runs after ingest — feeds null-rate alerts, key
    * candidate discovery, and partition-bound planning.
    *
    * Plan shape: ONE aggregation pass; the multiple COUNT(DISTINCT)s
    * plan as Catalyst's Expand (one shuffle carrying N streams), which
    * is the exact-distinct cost at any scale — swap in
    * approx_count_distinct when estimates suffice (see [[Hll]]). The
    * 1-row result pivots to rows in-row (explode of a literal-built
    * array), never a second pass. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns must exist: ${cols.filterNot(df.columns.contains).mkString(",")}")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      min(col(c).cast("string")).as(s"__min_$c"),
      max(col(c).cast("string")).as(s"__max_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))): _*)).as("s"))
      .select("s.*")
  }

  /** Per-group robust outlier profile: median and MAD (median absolute
    * deviation) of a 2-dp currency column, and the count of rows more
    * than `madK` MADs from the median — the outlier detector that,
    * unlike z-scores, is not itself corrupted by the outliers it
    * hunts. Cross-engine exact: values are scaled to integer cents
    * (floor(x·100 + 0.5) — one rounding dag, no accumulated FP), the
    * exact interpolated median of integers is an exact multiple of
    * 0.5 in IEEE double (and of 0.25 for the MAD over 0.5-step
    * deviations), so the median is reported ×2 and the MAD ×4 as
    * BIGINT — each scale clearing its own interpolation denominator,
    * because Spark's double→long cast truncates while SQL engines
    * round — and the `dev > madK·mad` comparison is bit-deterministic
    * in any engine.
    *
    * Plan shape: exact `percentile` per group (one shuffle of (group,
    * cents) pairs, per-group sort — the honest exact-median cost),
    * a broadcast-sized medians frame joined back over the scan, a
    * second exact percentile over deviations, and one map-combined
    * final aggregation. At 100 TB swap the two `percentile` calls for
    * `approx_percentile` (t-digest; same plan shape, no per-group
    * sort) when sketch error is acceptable — the gate pins the exact
    * variant.
    */
  def robustOutliers(df: DataFrame, group: String, value: String,
                     madK: Int = 3): DataFrame = {
    require(madK >= 1, "madK must be positive")
    val base = df.select(col(group).as("grp"),
        floor(col(value) * 100 + 0.5).cast("long").as("cents"))
      .filter(col("cents").isNotNull)
    val med = base.groupBy("grp")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = base.join(med, "grp")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = dev.groupBy("grp")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, "grp")
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_rows"),
        (first(col("med")) * 2).cast("long").as("med_cents_x2"),
        (first(col("mad")) * 4).cast("long").as("mad_cents_x4"),
        sum(when(col("dev") > col("mad") * madK, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Approximate-schema discovery: for each candidate functional
    * dependency a → b, count the left-hand values that VIOLATE it
    * (distinct b per a > 1) and the total distinct left-hand values —
    * zero violations means the dependency holds exactly (nation →
    * region hierarchies, id → attribute keys). The profiling step that
    * decides normalization, join keys, and partition hierarchies for
    * an unfamiliar ingested table.
    *
    * Plan shape: per candidate pair one map-combined (a, b) distinct
    * + one map-combined count per a — both shuffles carry key pairs
    * only; pairs are evaluated independently (a union of small
    * aggregates, cheap to run in one job). Exact counts by design:
    * violation counting is the point, an estimate cannot certify a
    * key. */
  def fdViolations(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate dependency")
    pairs.map { case (a, b) =>
      require(df.columns.contains(a) && df.columns.contains(b),
        s"columns must exist: $a, $b")
      df.select(col(a).cast("string").as("lhs"),
          col(b).cast("string").as("rhs"))
        .filter(col("lhs").isNotNull)
        .distinct()
        .groupBy("lhs").agg(count(lit(1)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(a).as("lhs_col"), lit(b).as("rhs_col"),
          col("n_lhs"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionByName(_))
  }

  /** (bin, n) for `bins` equal-width buckets of column `c` between
    * its min and max; the max value lands in the last bin. Degenerate
    * single-value columns collapse to bin 0. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val bounds = df.agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
    df.select(col(c).as("x")).filter(col("x").isNotNull)
      .join(broadcast(bounds))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(
          floor((col("x") - col("lo")) * bins / (col("hi") - col("lo")))
            .cast("long"),
          lit(bins - 1L))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Benford first-significant-digit profile of a positive numeric
    * column — the classic fabricated-data / unit-mix-up screen for
    * financial and count-like fields (organic multiplicative data
    * leads with 1 ~30% of the time; uniform leading digits scream
    * synthetic). The first digit comes from the DECIMAL RENDERING of
    * ⌊x⌋ (rows < 1 dropped) — no float log10 anywhere, so the
    * profile is bit-exact on any engine. One narrow projection + one
    * map-combined 9-row count. Compare against log10(1+1/d) shares
    * off-engine. */
  def benfordProfile(df: DataFrame, c: String): DataFrame =
    df.select(floor(col(c)).cast("long").as("_ix"))
      .filter(col("_ix") >= 1L)
      .select(substring(col("_ix").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .orderBy("digit")

  /** 2-D Pareto frontier (skyline): the points not dominated under
    * (minimize `costCol`, maximize `gainCol`) — price/performance
    * frontiers, quality-vs-length curation cuts, resource-allocation
    * envelopes. A point is dominated if another has cost ≤ AND gain ≥
    * (strict in at least one).
    *
    * Not the naive O(n²) dominance join: per distinct cost keep the
    * max gain (map-combined agg), then one DISTRIBUTED exclusive
    * running-max pass ([[Prefix.globalRunningMaxExclusive]] — range
    * exchange + per-partition offsets, never a single-reducer
    * window) — a cost's champion is on the frontier iff its gain
    * strictly exceeds the running max over all cheaper costs. The
    * cumulative pass runs over DISTINCT COSTS (already aggregated),
    * not rows. */
  def paretoFrontier(df: DataFrame, costCol: String, gainCol: String)
      : DataFrame = {
    val champs = df
      .select(col(costCol).as("cost"), col(gainCol).as("gain"))
      .filter(col("cost").isNotNull && col("gain").isNotNull)
      .groupBy("cost").agg(max(col("gain")).as("gain"))
    Prefix.globalRunningMaxExclusive(champs, Seq(col("cost")),
        col("gain"), "_pm")
      .filter(col("_pm").isNull || col("gain") > col("_pm"))
      .select(col("cost"), col("gain"))
  }

  /** Equal-frequency (quantile) binning of column `c` into `bins`
    * buckets — the feature-engineering discretizer (score → decile)
    * and the partition-balancing primitive ([[histogram]] is
    * equal-WIDTH; skewed value distributions need equal MASS). Each
    * bin's population differs by at most one row; NTILE's standard
    * rule (the first `n mod bins` bins take the extra row) over the
    * total order (value, tieBreak) makes assignment engine-exact.
    * `(c, tieBreak)` must be a TOTAL order (unique pairs) — the same
    * precondition the window form had. Returns per-bin
    * (bin, n, lo, hi) summaries.
    *
    * Scale shape: NTILE's bin is pure arithmetic over the global rank
    * — bin boundaries fall at ⌈n/b⌉·(n mod b) etc. — so no actual
    * NTILE window is needed: the rank comes DISTRIBUTED from
    * [[Prefix.globalRunningSum]] (range exchange + per-partition
    * offsets; sort work spreads over all partitions, exactly a
    * distributed sort's cost), the row count broadcasts as one row,
    * and the bin is an in-row integer expression. Exact at any scale
    * — the regimes where exact decile edges are the CONTRACT (billing
    * tiers, regulatory bands) pay a distributed sort, not a
    * single-reducer one. When sketch-grade edges suffice, cut
    * boundaries from [[graft.functions.QuantileSketchAgg]] and bin by
    * broadcast range lookup (one scan, no sort at all). */
  def equalFrequencyBins(df: DataFrame, c: String, tieBreak: String,
                         bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val ranked = Prefix.globalRunningSum(
      df.select(col(c).as("x"), col(tieBreak).as("_tb"))
        .filter(col("x").isNotNull),
      order = Seq(col("x"), col("_tb")), value = lit(1L), cumName = "_r")
    // n rides in as a 1-row broadcast off the checkpointed rank frame
    val n1 = ranked.agg(max(col("_r")).as("_n"))
    ranked.join(broadcast(n1))
      // NTILE(b): q = n div b rows per bin, the first rem = n mod b
      // bins take one extra; rank r ≤ (q+1)·rem lands in the wide
      // bins, the rest divide into the narrow ones (q = 0 ⇒ rem = n,
      // every row takes the wide branch — no division by zero)
      .withColumn("_q", expr(s"_n div ${bins}L"))
      .withColumn("_rem", expr(s"_n % ${bins}L"))
      .withColumn("bin",
        when(col("_r") <= (col("_q") + 1) * col("_rem"),
          expr("(_r - 1) div (_q + 1) + 1"))
          .otherwise(expr("_rem + (_r - (_q + 1) * _rem - 1) div _q + 1")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(col("x")).as("lo"),
        max(col("x")).as("hi"))
      .orderBy("bin")
  }

  /** Quantized information gain of a label given a feature — the
    * feature-relevance ranking every labeling/routing pipeline runs
    * ("does `source` predict `lang`?"). IG = H(Y) − H(Y|X) in the
    * floor-log₂ convention of [[TextAnalysis.tokenEntropy]]:
    * H_q(Y)·N = Σ_y c_y·⌊log₂(N div c_y)⌋ and
    * H_q(Y|X)·N = Σ_{x,y} c_xy·⌊log₂(c_x div c_xy)⌋ — every term an
    * exact integer, so both entropies (ppm, floor-divided by N) and
    * their difference are engine-exact. Quantization makes IG a
    * conservative estimate and occasionally slightly negative;
    * treat near-zero as "no signal".
    *
    * Plan shape: one map-combined (feature,label) contingency groupBy
    * (vocabulary-sized output), two marginal aggregations over it,
    * N and the entropy sums as 1-row broadcasts. The corpus is
    * scanned once; nothing corpus-sized shuffles.
    *
    * Returns one row: `n, h_label_ppm, h_cond_ppm, ig_ppm`. */
  def informationGain(df: DataFrame, feature: String, label: String)
      : DataFrame = {
    def bits(n: Column, c: Column): Column =
      (length(bin(IntMath.truncDiv(n, c))) - 1).cast("long")
    val xy = df.select(col(feature).cast("string").as("_x"),
        col(label).cast("string").as("_y"))
      .groupBy("_x", "_y").agg(count(lit(1)).as("_cxy"))
      .localCheckpoint()
    val n1 = xy.agg(sum("_cxy").as("_n"))
    val hy = xy.groupBy("_y").agg(sum("_cxy").as("_cy"))
      .crossJoin(broadcast(n1))
      .agg(sum(col("_cy") * bits(col("_n"), col("_cy"))).as("_hyBits"))
    val cx = xy.groupBy("_x").agg(sum("_cxy").as("_cx"))
    val hyx = xy.join(cx, Seq("_x"))
      .agg(sum(col("_cxy") * bits(col("_cx"), col("_cxy"))).as("_hyxBits"))
    n1.crossJoin(broadcast(hy)).crossJoin(broadcast(hyx))
      .select(col("_n").as("n"),
        IntMath.ppmDiv(col("_hyBits"), col("_n")).as("h_label_ppm"),
        IntMath.ppmDiv(col("_hyxBits"), col("_n")).as("h_cond_ppm"),
        (IntMath.ppmDiv(col("_hyBits"), col("_n")) -
          IntMath.ppmDiv(col("_hyxBits"), col("_n"))).as("ig_ppm"))
  }

  /** Per-group percentile-rank normalization: each row's value mapped
    * to its midrank percentile WITHIN its group, in exact ppm — the
    * cross-source score calibration step ("a web-crawl quality score
    * of 0.7 and a books score of 0.7 are not the same quantile")
    * applied before any global threshold or mixture cut. Monotone per
    * group, uniform on [0, 1e6) per group by construction, engine-
    * exact (the midrank 2·cumBefore+cnt+1 is kept doubled as an
    * integer; pct_ppm = ⌊10⁶·(rank2−1) / (2·n_g)⌋).
    *
    * Plan shape: ties collapse through a map-combined (group, value)
    * count FIRST, the cumulative window then ranks DISTINCT values
    * per group (groups spread across reducers — no global order),
    * group totals join from their own tiny aggregate, and rows pull
    * their percentile back via one (group, value) equi-join. Adds
    * `pct_ppm`.
    *
    * NULL handling: rows whose group or value is NULL are EXCLUDED
    * from the output (a NULL has no rank position) — filtered
    * explicitly up front rather than silently dropped by the
    * null-rejecting equi-join. */
  def percentileRank(df: DataFrame, group: String, value: Column)
      : DataFrame = {
    val in = df.filter(col(group).isNotNull && value.isNotNull)
    val byv = in.select(col(group).as("_g"), value.as("_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byv.withColumn("_cum", sum(col("_cnt")).over(w))
      .withColumn("_r2", lit(2L) * (col("_cum") - col("_cnt")) + col("_cnt") + 1)
    val tot = byv.groupBy("_g").agg(sum(col("_cnt")).as("_ng"))
    val pct = ranked.join(tot, Seq("_g"))
      .select(col("_g"), col("_v"),
        IntMath.truncDiv(lit(1000000L) * (col("_r2") - 1),
          lit(2L) * col("_ng")).as("pct_ppm"))
    in.join(pct, col(group) === col("_g") && value === col("_v"))
      .drop("_g", "_v")
  }

  /** Exact trimmed mean per group: drop the k = ⌊α·n⌋ smallest and
    * largest ROWS of each group, average the rest — the robust
    * central tendency between mean (α = 0) and median (α → 0.5),
    * standard for latency/price/length profiles where a handful of
    * garbage rows would drag a plain mean. Integer-exact: values are
    * longs (cents/counts), and a tied value straddling the trim
    * boundary contributes exactly its surviving multiplicity via
    * integer interval intersection — kept(v) = max(0,
    * min(cum, n−k) − max(cum−cnt, k)) — no row sampling, no floats.
    *
    * Plan shape: ties collapse through a map-combined (group, value)
    * count, the cumulative is a per-group partitioned window over
    * DISTINCT values ([[weightedMedian]]'s shape — groups spread
    * across reducers), totals join from their own tiny aggregate.
    * Returns (group, n, n_trimmed_each, n_kept, sum_kept,
    * mean_floor); groups where 2k ≥ n emit null mean. */
  def trimmedMean(df: DataFrame, group: String, value: Column,
                  alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 0 && alphaPpm < 500000,
      "alphaPpm must be in [0, 500000) — trimming half from each end leaves nothing")
    val byv = df.select(col(group).as("_g"), value.cast("long").as("_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byv.withColumn("_cum", sum(col("_cnt")).over(w))
    val tot = byv.groupBy("_g").agg(sum(col("_cnt")).as("_n"))
    cum.join(tot, Seq("_g"))
      .withColumn("_k", IntMath.truncDiv(col("_n") * alphaPpm, lit(1000000L)))
      .withColumn("_kept", greatest(lit(0L),
        least(col("_cum"), col("_n") - col("_k")) -
          greatest(col("_cum") - col("_cnt"), col("_k"))))
      .groupBy(col("_g").as(group))
      .agg(min(col("_n")).as("n"), min(col("_k")).as("n_trimmed_each"),
        sum(col("_kept")).as("n_kept"),
        sum(col("_kept").cast("decimal(38,0)") * col("_v")).as("_sum"))
      .select(col(group), col("n"), col("n_trimmed_each"), col("n_kept"),
        col("_sum").cast("decimal(38,0)").as("sum_kept"),
        when(col("n_kept") > 0,
          IntMath.truncDiv(col("_sum"), col("n_kept"))).as("mean_floor"))
  }

  /** JSON payload key profile — the schema-on-read census of a
    * semi-structured column ("which keys actually occur, how often,
    * how many distinct values"): the first question against any
    * event/props/metadata blob lake, and the input to promotion
    * decisions (a key present in 99% of rows with 3 distinct values
    * wants to be a real column; one in 0.1% with a million values
    * wants to stay JSON). Values compare as their unquoted string
    * rendering (`map<string,string>` parse — numbers as digits,
    * strings as contents), the form both engines produce.
    *
    * Scale shape: one in-row parse + map explode (scan speed), one
    * map-combined (key, value) count, one per-key reduce. Malformed
    * JSON rows parse to null maps and simply drop out. */
  def jsonKeyProfile(df: DataFrame, json: Column): DataFrame =
    df.select(explode(from_json(json, MapType(StringType, StringType)))
        .as(Seq("key", "value")))
      .groupBy("key", "value").agg(count(lit(1)).as("_cnt"))
      .groupBy("key")
      .agg(sum(col("_cnt")).as("n_present"),
        count(lit(1)).as("n_distinct_values"))

  /** Winsorized mean per group — [[trimmedMean]]'s robust sibling
    * that CLIPS instead of discards: the k = ⌊n·α⌋ smallest values
    * are replaced by the value at rank k+1 and the k largest by the
    * value at rank n−k, so every row still votes (the estimator of
    * choice when trimming would throw away real mass, e.g. heavy-
    * tailed latency/length columns). Exact integers: winsorized sum =
    * Σ(kept copies · value) + k·v_lo + k·v_hi over the distinct-value
    * spine, mean = trunc(sum/n).
    *
    * Same scale shape as [[trimmedMean]]: ties collapse map-side to a
    * per-group DISTINCT-value spine, one per-group cumulative window
    * over that spine (bounded by distinct values, not rows), and the
    * boundary values fall out of the same cumulative bracketing that
    * does the trimming — no extra pass, no sort of raw rows. */
  def winsorizedMean(df: DataFrame, group: String, value: Column,
                     alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 0 && alphaPpm < 500000,
      "alphaPpm must be in [0, 500000) — clipping half from each end is degenerate")
    val byv = df.select(col(group).as("_g"), value.cast("long").as("_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byv.withColumn("_cum", sum(col("_cnt")).over(w))
    val tot = byv.groupBy("_g").agg(sum(col("_cnt")).as("_n"))
    val lo = col("_cum") - col("_cnt") // exclusive cumulative before row
    cum.join(tot, Seq("_g"))
      .withColumn("_k", IntMath.truncDiv(col("_n") * alphaPpm, lit(1000000L)))
      .withColumn("_kept", greatest(lit(0L),
        least(col("_cum"), col("_n") - col("_k")) -
          greatest(lo, col("_k"))))
      .withColumn("_lo_mass", // this row holds rank k+1 → absorbs k copies
        when(lo < col("_k") + 1 && col("_cum") >= col("_k") + 1,
          col("_k")).otherwise(lit(0L)))
      .withColumn("_hi_mass", // this row holds rank n−k
        when(lo < col("_n") - col("_k") && col("_cum") >= col("_n") - col("_k"),
          col("_k")).otherwise(lit(0L)))
      .groupBy(col("_g").as(group))
      .agg(min(col("_n")).as("n"), min(col("_k")).as("n_clipped_each"),
        sum((col("_kept") + col("_lo_mass") + col("_hi_mass"))
          .cast("decimal(38,0)") * col("_v")).as("_sum"))
      .select(col(group), col("n"), col("n_clipped_each"),
        col("_sum").cast("decimal(38,0)").as("sum_winsorized"),
        when(col("n") > 0, IntMath.truncDiv(col("_sum"), col("n")))
          .as("mean_floor"))
  }

  /** Quantile mapping (histogram matching): every distinct value of a
    * SOURCE distribution mapped to the REFERENCE distribution's value
    * at the same quantile — the score-harmonization step when a
    * quality classifier is retrained ("old 0.63 ≙ new 0.58") or when
    * two corpora's raw scores must be made comparable before one
    * global threshold. Exact integers throughout: the source value's
    * midrank fraction (r2−1)/(2·n_src) is matched by integer
    * cross-multiplication (2·cum_ref·n_src ≥ (r2−1)·n_ref — valid to
    * ~10⁹ rows per side in a long), and the mapped value is the
    * smallest reference value whose inclusive CDF reaches that
    * fraction (percentile_disc convention: always an actual
    * reference value, no interpolation).
    *
    * Plan shape: both distributions collapse to distinct-value spines
    * (map-combined); each spine gets its cumulative via
    * [[Prefix.globalRunningSum]]; the match itself is the classic
    * distributed merge — union both spines on the COMMON integer
    * fraction axis, order descending, and take the running min of
    * reference values seen so far via
    * [[Prefix.globalRunningMaxExclusive]] on the negated value
    * (range exchange + offsets — no single-reducer window, no
    * quadratic join). Totals ride as 1-row broadcasts.
    *
    * Returns (v_src, pct_ppm, v_mapped), one row per distinct source
    * value. */
  def quantileMap(ref: DataFrame, src: DataFrame, value: Column)
      : DataFrame = {
    def spine(df: DataFrame) = Prefix.globalRunningSum(
      df.select(value.cast("long").as("_v")).filter(col("_v").isNotNull)
        .groupBy("_v").agg(count(lit(1)).as("_c")),
      Seq(col("_v")), col("_c"), "_cum")
    val aCum = spine(ref)
    val bCum = spine(src)
    val totals = aCum.agg(max(col("_cum")).as("_na"))
      .crossJoin(broadcast(bCum.agg(max(col("_cum")).as("_nb"))))
    val aRows = aCum.crossJoin(broadcast(totals))
      .select((lit(2L) * col("_cum") * col("_nb")).as("_pos"),
        lit(1).as("_isA"), col("_v").as("_va"),
        lit(null).cast("long").as("_vb"), lit(null).cast("long").as("_r2"),
        col("_nb").as("_tnb"))
    val bRows = bCum.crossJoin(broadcast(totals))
      // r2 − 1 = 2·cumBefore + c
      .select(((lit(2L) * (col("_cum") - col("_c")) + col("_c"))
          * col("_na")).as("_pos"),
        lit(0).as("_isA"), lit(null).cast("long").as("_va"),
        col("_v").as("_vb"),
        (lit(2L) * (col("_cum") - col("_c")) + col("_c") + 1).as("_r2"),
        col("_nb").as("_tnb"))
    val merged = Prefix.globalRunningMaxExclusive(
      aRows.unionByName(bRows),
      order = Seq(col("_pos").desc, col("_isA").desc),
      value = lit(0L) - col("_va"), name = "_negmin")
    merged.filter(col("_isA") === 0)
      .select(col("_vb").as("v_src"),
        IntMath.truncDiv(lit(1000000L) * (col("_r2") - 1),
          lit(2L) * col("_tnb")).as("pct_ppm"),
        (lit(0L) - col("_negmin")).as("v_mapped"))
  }

  /** Corpus concentration profile: Gini coefficient and Herfindahl
    * index of a non-negative weight distribution — "is the training
    * mix dominated by a few domains/sources/languages", the
    * one-number diversity audit run before setting mixture weights
    * (a Gini near 1 or HHI near 10⁶ says the dedup/cap stages have a
    * monoculture to break up).
    *
    * Exact integers: with weights x₁ ≤ … ≤ xₙ (ties broken by group
    * — the Gini sum is tie-order-invariant, the order just has to be
    * total), G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx), emitted as
    * (gini_num, gini_den) DECIMAL components plus floor-ppm; HHI =
    * Σxᵢ² / (Σx)² in ppm via DECIMAL cross-division. No floats.
    *
    * Plan shape: one map-combined per-group weight sum (groups are
    * vocabulary-sized), ranks over the group spine via
    * [[Prefix.globalRunningSum]] (range exchange + offsets — never a
    * single-reducer window), one 1-row aggregate. */
  def concentration(df: DataFrame, group: String, weight: Column)
      : DataFrame = {
    val sums = df.groupBy(col(group).as("_g"))
      .agg(sum(weight.cast("long")).as("_x"))
    val ranked = Prefix.globalRunningSum(sums,
      order = Seq(col("_x"), col("_g")), value = lit(1L), cumName = "_i")
    val agg = ranked.agg(
      count(lit(1)).cast("decimal(38,0)").as("_n"),
      sum(col("_x").cast("decimal(38,0)")).as("_sx"),
      sum(col("_i").cast("decimal(38,0)") * col("_x")).as("_six"),
      sum(col("_x").cast("decimal(38,0)") * col("_x")).as("_sxx"))
    agg.select(col("_n").cast("long").as("n_groups"),
      col("_sx").cast("long").as("total"),
      (lit(2L) * col("_six") - (col("_n") + 1) * col("_sx"))
        .cast("decimal(38,0)").as("gini_num"),
      (col("_n") * col("_sx")).cast("decimal(38,0)").as("gini_den"),
      IntMath.ppmDiv(lit(2L) * col("_six") - (col("_n") + 1) * col("_sx"),
        col("_n") * col("_sx")).as("gini_ppm"),
      IntMath.truncDiv(col("_sxx") * lit(1000000L),
        col("_sx") * col("_sx")).as("hhi_ppm"))
  }

  /** Exact Spearman rank correlation, reported as its integer
    * components: monotone-association between two numeric columns —
    * the scale-free "does quality score track length / does price
    * track quantity" check that is robust to outliers and any
    * monotone transform (where Pearson is neither).
    *
    * Average ranks (the tie-correct convention) are kept exact by
    * DOUBLING: a value with `cnt` ties and `cumBefore` smaller rows
    * has avg rank (2·cumBefore + cnt + 1)/2, so rank2 =
    * 2·cumBefore + cnt + 1 is always an integer. Spearman ρ is then
    * Pearson over rank2 pairs, emitted as exact DECIMAL(38,0)
    * components: ρ = num / √(den_x·den_y) with num = n·Σxy − Σx·Σy,
    * den_x = n·Σx² − (Σx)², den_y likewise — one IEEE sqrt away from
    * the scalar, with every accumulation exact (valid to n ≈ 3·10⁹,
    * where n·Σx² ≈ 4n⁴ approaches DECIMAL(38)).
    *
    * Plan shape: per variable one map-combined distinct-value count,
    * then [[Prefix.globalRunningSum]] over the value spine (range
    * exchange + per-partition offsets — never a single-reducer
    * window; the spine is distinct values, not rows), one equi-join
    * of ranks back to rows, one final 1-row aggregate. */
  def spearmanComponents(df: DataFrame, x: Column, y: Column): DataFrame = {
    val rows = df.select(x.as("_x"), y.as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .localCheckpoint()
    def rank2(c: String): DataFrame = {
      val cnts = rows.groupBy(col(c)).agg(count(lit(1)).as("_cnt"))
      Prefix.globalRunningSum(cnts, order = Seq(col(c)),
          value = col("_cnt"), cumName = "_cum")
        .select(col(c),
          (lit(2L) * (col("_cum") - col("_cnt")) + col("_cnt") + 1)
            .as(s"_r$c"))
    }
    rows.join(rank2("_x"), Seq("_x")).join(rank2("_y"), Seq("_y"))
      .select(col("_r_x").cast("decimal(38,0)").as("_rx"),
        col("_r_y").cast("decimal(38,0)").as("_ry"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_rx")).as("_sx"), sum(col("_ry")).as("_sy"),
        sum(col("_rx") * col("_rx")).as("_sxx"),
        sum(col("_ry") * col("_ry")).as("_syy"),
        sum(col("_rx") * col("_ry")).as("_sxy"))
      .select(col("_n").cast("long").as("n"),
        (col("_n") * col("_sxy") - col("_sx") * col("_sy"))
          .cast("decimal(38,0)").as("rho_num"),
        (col("_n") * col("_sxx") - col("_sx") * col("_sx"))
          .cast("decimal(38,0)").as("den_x"),
        (col("_n") * col("_syy") - col("_sy") * col("_sy"))
          .cast("decimal(38,0)").as("den_y"))
  }

  /** Exact weighted (lower) median per group: the smallest value v
    * with 2·Σ_{x≤v} w(x) ≥ W — robust central tendency where rows
    * carry multiplicity (token counts, quantities, sampling weights).
    * Integer-exact: values and weights cast to long, the decision is
    * an integer cross-multiplication, no interpolation.
    *
    * Plan shape: ties collapse first through a map-combined
    * (group, value) groupBy — the window then ranks DISTINCT values
    * per group, not rows — and the cumulative sum is a per-group
    * partitioned window (groups spread across reducers; no global
    * order). Group totals join back from their own tiny aggregate.
    *
    * Returns (group, w_total, w_median). */
  def weightedMedian(df: DataFrame, group: String, value: Column,
                     weight: Column): DataFrame = {
    val byv = df.select(col(group).as("_g"), value.cast("long").as("_v"),
        weight.cast("long").as("_w"))
      .groupBy("_g", "_v").agg(sum("_w").as("_wv"))
    val w = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byv.withColumn("_cum", sum("_wv").over(w))
    val tot = byv.groupBy("_g").agg(sum("_wv").as("_W"))
    cum.join(tot, Seq("_g"))
      .filter(lit(2L) * col("_cum") >= col("_W"))
      .groupBy(col("_g").as(group))
      .agg(min("_W").as("w_total"), min("_v").as("w_median"))
  }
}
