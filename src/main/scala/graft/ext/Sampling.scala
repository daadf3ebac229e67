package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything here is hash-based, not RNG-based: a row's fate is a
  * pure function of its key, so samples are (a) reproducible across
  * runs, engines and task retries, (b) consistent across tables that
  * share the key (sample a doc → its embedding row samples with it),
  * and (c) computable as a narrow filter/map — no shuffle, no
  * `sample()` RNG state, scan-speed at any corpus size.
  *
  * The hash coordinate is an 8-bit bucket from md5 hex nibbles (one
  * byte of the digest per coordinate) — coarse on purpose: rates
  * quantize to 1/256, which training-data sampling tolerates, and the
  * nibble arithmetic is reproducible in ANY engine (the DuckDB oracle
  * mirrors it with strpos on the hex string, x19).
  */
object Sampling {

  /** Deterministic bucket in [0, 256): byte `offset` of
    * md5(salt || key), read from the hex digest. Different offsets
    * (0-7 on the first half of the digest) give independent
    * coordinates for layered decisions (sample, then split). */
  def hashBucket256(key: Column, salt: String, offset: Int = 0): Column = {
    require(offset >= 0 && offset <= 7, "md5 supplies 8 independent bytes here")
    conv(substring(md5(concat(lit(salt), key.cast("string")).cast("binary")),
      1 + 2 * offset, 2), 16, 10).cast("int")
  }

  /** Stratified sample at per-stratum rates: a row survives iff its
    * hash bucket < floor(rate·256) for its stratum (effective rate =
    * floor(rate·256)/256; strata absent from `rates` are dropped).
    * A pure narrow filter — the Parquet scan is the whole plan. */
  def stratifiedSample(df: DataFrame, strata: String, key: String,
                       rates: Map[String, Double], salt: String): DataFrame = {
    val thresh = rates.foldLeft(lit(-1)) { case (acc, (s, r)) =>
      when(col(strata) === s, lit(math.floor(r * 256).toInt)).otherwise(acc)
    }
    df.filter(hashBucket256(col(key), salt) < thresh)
  }

  /** Data mixing: compose a training corpus from sources at target
    * proportions. Source `s` contributes its floor(budget·weight(s))
    * hash-smallest rows (md5 order — engine-portable, deterministic,
    * growth-stable: a source gaining rows never evicts an admitted row
    * unless it hashes earlier). Sources without a weight are dropped.
    * One shuffle: the per-source admission window partitions on the
    * source column; under-populated sources contribute everything they
    * have (mixture degrades gracefully, never errors). */
  def mixture(df: DataFrame, source: String, key: String,
              weights: Map[String, Double], budget: Long,
              salt: String): DataFrame = {
    require(weights.values.forall(_ >= 0), "non-negative mixture weights")
    val quota = weights.foldLeft(lit(-1L)) { case (acc, (s, w)) =>
      when(col(source) === s, lit(math.floor(budget * w).toLong)).otherwise(acc)
    }
    val h = md5(concat(lit(salt), col(key).cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(source)).orderBy(h, col(key))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }

  /** Weighted sampling without replacement via min-of-w hash
    * priorities (the "lottery ticket" scheme): an item of integer
    * weight w draws tickets md5(salt‖key‖':'‖j) for j < w and keeps
    * the lexicographically smallest; the sample is the n items with
    * the smallest priorities (ties by key). More tickets → a
    * stochastically smaller minimum, so inclusion odds grow with
    * weight — and because tickets j < w are a PREFIX of tickets
    * j < w', raising an item's weight can only lower its priority:
    * samples are monotone under weight growth, reproducible across
    * runs/engines/retries, and need no RNG state.
    *
    * Scale shape: the ticket fold is an in-row expression (≤
    * `maxWeight` digests per row, clamped so a pathological weight
    * can't make one row explode); the global top-n is a
    * per-partition heap + single tiny gather (TakeOrdered), never a
    * full sort. Weights clamp to [1, maxWeight] — integer tickets
    * are the price of engine-exact determinism (a float-weighted
    * exponential draw would need ln(), whose last bit differs by
    * engine). */
  def weightedSample(df: DataFrame, key: String, weight: Column, n: Int,
                     salt: String, maxWeight: Int = 64): DataFrame = {
    require(n >= 1 && maxWeight >= 1, "need n >= 1 and maxWeight >= 1")
    val wc = greatest(lit(1), least(lit(maxWeight), weight.cast("int")))
    val priority = array_min(transform(
      sequence(lit(0), wc - 1),
      j => md5(concat(lit(salt), col(key).cast("string"), lit(":"),
        j.cast("string")).cast("binary"))))
    df.withColumn("sample_weight", wc.cast("long"))
      .withColumn("priority", priority)
      .orderBy(col("priority"), col(key))
      .limit(n)
  }

  /** Deterministic train/val/test split: labels each row by where its
    * (independent, offset=1) hash bucket falls among the cumulative
    * weight boundaries. Adds a `split` column; weights are normalized,
    * boundaries quantize to 1/256. Rows never migrate between splits
    * when the corpus grows — membership depends only on the key. */
  def hashSplit(df: DataFrame, key: String,
                splits: Seq[(String, Double)], salt: String): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(b => math.floor(b * 256).toInt)
    val b = hashBucket256(col(key), salt, offset = 1)
    val labeled = splits.init.zip(bounds.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
      }
    df.withColumn("split",
      labeled.fold(lit(splits.last._1): Column)(_.otherwise(splits.last._1)))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * land in the SAME split, or eval measures memorized train content
    * (the classic contamination-by-split bug — [[hashSplit]] on doc
    * ids scatters a near-dup cluster across train AND test). Split
    * membership is decided per CLUSTER: connected components over the
    * caller's near-dup `pairs` ([[Dedup.minhashLshPairs]] /
    * [[Dedup.ngramJaccardPairs]] output), singleton docs form their
    * own cluster (their id), then [[hashSplit]] hashes the CLUSTER
    * label — same label ⇒ same bucket ⇒ same split, by construction.
    *
    * Scale shape: the pair frame reduces to clusters via
    * [[Dedup.connectedComponents]] (pointer-jumping rounds, edges-only
    * shuffles); one left join of the corpus against the cluster map
    * (clusters ≤ docs-with-a-dup, a small fraction of the corpus);
    * the split label itself is a narrow in-row hash. Adds `cluster`
    * (the split-deciding group) and `split`. */
  def leakageSafeSplit(df: DataFrame, id: String, pairs: DataFrame,
                       splits: Seq[(String, Double)], salt: String)
      : DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("_cid"), col("cluster").as("_cl"))
    val grouped = df.join(comp, df(id) === col("_cid"), "left")
      .withColumn("cluster", coalesce(col("_cl"), df(id).cast("long")))
      .drop("_cid", "_cl")
    hashSplit(grouped, "cluster", splits, salt)
  }

  /** Deterministic epoch shuffle + sharding for training-data export:
    * every row gets a stable pseudo-random coordinate — `shard`
    * (a 16-bit digest slice mod `shards`) and `shard_pos` (md5 rank
    * within the shard) — so an "epoch" is a reproducible global
    * permutation materialized as contiguous shard sequences (the
    * TFRecord/WebDataset layout): identical across runs, engines and
    * task retries, no RNG seed plumbing. A different `salt` is the
    * next epoch's fresh permutation — the digest input is
    * `salt ‖ ':' ‖ key` (explicit separator, like [[rendezvousShard]]
    * and [[hashNegatives]]), so distinct (salt, key) pairs can never
    * collide into one digest across epochs.
    *
    * Both coordinates read the SAME per-row digest: `shard` is hex
    * chars 5-8 (16 bits — worst-case shard imbalance from the mod is
    * ⌈65536/shards⌉/⌊65536/shards⌋, ≤ 1+2⁻¹² relative for shards ≤ 16,
    * vs up to 50% for one byte mod a non-divisor of 256) and the
    * position rank orders by the full digest, whose leading 4 chars
    * are independent of the shard slice.
    *
    * Plan shape: the shard is a narrow in-row hash; positions are ONE
    * window per shard, and shards are balanced by construction
    * (~|rows|/shards each), so the sort work is evenly spread across
    * exactly `shards` reducers — this is the rare case where a
    * rank-assigning window is the honest full cost of the semantics
    * (a total per-shard order IS the product). */
  def epochShuffle(df: DataFrame, key: String, salt: String,
                   shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 65536,
      "need 1..65536 shards (two hash bytes)")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(key))
    df
      .withColumn("_h",
        md5(concat(lit(salt), lit(":"), col(key).cast("string"))
          .cast("binary")))
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 5, 4), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .drop("_h")
  }

  /** Rendezvous (highest-random-weight) shard assignment: each key
    * goes to the shard whose md5(salt ‖ shard ‖ key) digest is
    * lexicographically largest — the consistent-placement primitive
    * for growing/shrinking a sharded store. Against mod-N hashing
    * (where resizing N reshuffles almost EVERY key), adding a shard
    * moves exactly the keys that now win for it — 1/(n+1) of the
    * corpus in expectation — and removing one moves only its own
    * keys; at 100 TB that is the difference between an incremental
    * top-up and a full rewrite.
    *
    * Pure in-row expression (`shards` digests per row, no shuffle,
    * no coordination state) — scan speed; determinism inherits from
    * md5. Returns df plus a `shard` column with the winning id. */
  def rendezvousShard(df: DataFrame, key: String, salt: String,
                      shardIds: Seq[Long]): DataFrame = {
    require(shardIds.nonEmpty && shardIds.distinct.size == shardIds.size,
      "need distinct shard ids")
    val best = shardIds.map { sid =>
      struct(
        md5(concat(lit(salt), lit(":"), lit(sid.toString), lit(":"),
          col(key).cast("string")).cast("binary")).as("h"),
        lit(sid).as("sid"))
    }.reduce((a, b) => when(a("h") >= b("h"), a).otherwise(b))
    df.withColumn("shard", best.getField("sid"))
  }

  /** Deterministic negative sampling for contrastive / recommender
    * training: for every user in `interactions`, pick `k` items from
    * the item vocabulary the user has NEVER interacted with, ranked
    * by a salted per-(user, item) hash — the uniform-negative
    * baseline, reproducible run-to-run (a `rand()` draw is not, and
    * resampling negatives between epochs silently changes the
    * training distribution).
    *
    * Plan shape at scale: the item vocabulary is derived once
    * (map-combined distinct — vocabularies are small relative to
    * interactions by definition) and broadcast against the distinct
    * user set; the seen-set removal is one (user, item) anti-join of
    * the candidate grid against the deduplicated interactions; the
    * per-user top-k is a key-bounded window over ≤ |vocab| rows per
    * user. Nothing global is ever sorted; the grid is |users|·|vocab|
    * rows, the honest cost of uniform negatives (cap the vocabulary
    * upstream if it is not dimension-sized). */
  /** Deterministic fixed-size per-group sample: exactly
    * min(k, |group|) rows per `group` value, chosen by ranking each
    * group's rows on a salted md5 of the row key. The eval-subset
    * primitive ("5 docs per language for the human-review queue",
    * "1000 examples per source for the probe suite") — where
    * [[stratifiedSample]] draws a deterministic FRACTION per stratum,
    * this draws a deterministic COUNT, and a different `salt` redraws
    * the panel without touching any seed plumbing.
    *
    * Plan shape: one hash-partitioned window per group — the sort is
    * per-group and groups spread across all reducers, so there is no
    * global order and no single-reducer task; work is bounded by the
    * largest group (salt-split upstream if one stratum dominates).
    * Adds `sample_rank` (1..k within the group). */
  def fixedKPerGroup(df: DataFrame, group: String, key: String, k: Int,
                     salt: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(col(group)).orderBy(
      md5(concat(lit(salt), lit(":"), col(key).cast("string"))
        .cast("binary")),
      col(key))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Per-domain document cap — "keep at most `cap` docs per site,
    * best quality first": the anti-over-representation rule every
    * web-scale pretraining mix applies (a single crawl-friendly
    * domain must not dominate the corpus; C4/RefinedWeb-style
    * curation). Deterministic: quality descending, key ascending on
    * ties.
    *
    * Plan shape: NOT a per-domain row_number window (that sorts every
    * row of every domain — and the domains this operator exists for
    * are exactly the pathological ones). The per-domain top-cap is a
    * bounded [[graft.functions.TopKAgg]] aggregate: each map task
    * reduces to ≤ cap (quality, key) pairs per domain before the
    * shuffle, so a 10⁹-doc domain ships cap pairs per mapper, never
    * 10⁹ rows to one reducer. Kept keys then pull their full rows
    * back via one equi-join. Adds `cap_rank` (1..cap, quality order
    * within the domain). `key` must be numeric-unique; `quality`
    * must be exactly representable in double (counts/ppm scores are;
    * see TopKAgg). */
  def domainCap(df: DataFrame, domain: String, key: String,
                quality: Column, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val kept = df.groupBy(col(domain).as("_dc_g"))
      .agg(graft.functions.TopKAgg.topk(quality, col(key), cap).as("_top"))
      .select(col("_dc_g"), posexplode(col("_top")).as(Seq("_pos", "_kv")))
      .select(col("_dc_g"), col("_kv.id").as("_dc_k"),
        (col("_pos") + 1).cast("long").as("cap_rank"))
    df.join(kept, col(domain) === col("_dc_g") &&
        col(key).cast("long") === col("_dc_k"))
      .drop("_dc_g", "_dc_k")
  }

  /** Feasible mixture quota: given target per-source weights (ppm)
    * and the observed per-source token supply, compute the LARGEST
    * total budget at which the target mixture is exactly achievable
    * without repeating data — the planning step before sampling a
    * pretraining mix ("web 60%, code 30%, papers 10%" is only
    * realizable up to the scarcest source's supply ÷ its weight).
    * Everything is exact integer arithmetic: budget* =
    * min_s ⌊avail_s·10⁶ / w_s⌋, quota_s = ⌊budget*·w_s / 10⁶⌋,
    * accept_ppm = ⌊quota_s·10⁶ / avail_s⌋ — feed accept_ppm straight
    * into [[hashBucket256]]-style deterministic acceptance.
    *
    * Plan shape: one map-combined per-source token sum (sources are
    * few by nature), the target map rides in as a literal frame, the
    * min is a 1-row broadcast. Sources named in the target but
    * absent from the corpus force budget* = 0 (the mixture is
    * infeasible — surfaced, not silently renormalized); corpus
    * sources not in the target get quota 0. */
  def mixtureQuota(df: DataFrame, source: String, tokens: Column,
                   targetPpm: Map[String, Long]): DataFrame = {
    require(targetPpm.nonEmpty && targetPpm.values.forall(_ > 0),
      "target weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val target = targetPpm.toSeq.sortBy(_._1).toDF("_src", "target_ppm")
    val avail = df.groupBy(col(source).as("_src"))
      .agg(sum(tokens.cast("long")).as("avail_tokens"))
    val joined = target.join(avail, Seq("_src"), "full_outer")
      .na.fill(0L, Seq("avail_tokens", "target_ppm"))
    // multiplications lift to DECIMAL(38,0) BEFORE scaling by 10⁶ —
    // a long multiply would overflow past ~9·10¹² source tokens
    val budget = joined.filter(col("target_ppm") > 0)
      .select(IntMath.truncDiv(
        col("avail_tokens").cast("decimal(38,0)") * lit(1000000L),
        col("target_ppm")).as("_b"))
      .agg(min(col("_b")).as("budget_total"))
    val quota = IntMath.truncDiv(
      col("budget_total").cast("decimal(38,0)") * col("target_ppm"),
      lit(1000000L))
    joined.crossJoin(broadcast(budget))
      .select(col("_src").as(source), col("avail_tokens"),
        col("target_ppm"), col("budget_total"),
        quota.as("quota_tokens"),
        when(col("avail_tokens") > 0,
          IntMath.ppmDiv(quota, col("avail_tokens")))
          .otherwise(0L).as("accept_ppm"))
  }

  def hashNegatives(interactions: DataFrame, user: String, item: String,
                    k: Int, salt: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val seen = interactions.select(col(user).as("_u"), col(item).as("_i"))
      .distinct()
    val users = seen.select(col("_u")).distinct()
    val vocab = seen.select(col("_i")).distinct()
    val candidates = users.join(broadcast(vocab))
      .join(seen, Seq("_u", "_i"), "left_anti")
    val w = Window.partitionBy(col("_u")).orderBy(
      md5(concat_ws(" ", lit(salt), col("_u").cast("string"),
        col("_i").cast("string"))),
      col("_i"))
    candidates.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col("_u").as(user), col("_i").as(s"neg_$item"),
        col("neg_rank").cast("long").as("neg_rank"))
  }

  /** Per-group top-p (nucleus) truncation: within each group, keep
    * the smallest prefix of items — ordered by weight desc, id asc —
    * whose cumulative weight reaches `pPpm` millionths of the group
    * total. The vocabulary/domain-curation primitive ("the terms
    * carrying 90% of each language's token mass", "the sources
    * covering 99% of a domain's documents"); the boundary item that
    * CROSSES the threshold is kept, so coverage ≥ p exactly.
    *
    * The keep decision is the exact cross-multiplication
    * `cum_before · 10⁶ < pPpm · total`, lifted to DECIMAL(38,0)
    * BEFORE scaling (a raw Long multiply overflows past ~9·10¹²
    * group-total weight — well inside a multi-TB corpus's token
    * mass) — no float shares, engine-identical at any scale.
    * Returns kept rows as (group, id, weight, cum_weight,
    * rank). Plan shape: one map-combined total per group equi-joined
    * back, one per-GROUP window (bounded by group size, key-
    * partitioned — never global); groups at power-law scale are
    * exactly the case where the kept prefix is tiny relative to the
    * tail this drops.
    *
    * WEIGHT CONTRACT: weights are INTEGER COUNTS (token counts, doc
    * counts — the units a corpus mixture is budgeted in). A
    * fractional weight column is rejected up front rather than
    * silently truncated: truncation before the group total and the
    * cumulative sum can flip keep decisions and void the coverage
    * ≥ p guarantee. Scale fractional scores to an integer grid (e.g.
    * ppm) before calling. */
  def topPByGroup(df: DataFrame, group: String, id: String,
                  weight: Column, pPpm: Long): DataFrame = {
    require(pPpm >= 0 && pPpm <= 1000000L, "pPpm must be in [0, 1e6]")
    val probe = df.select(weight.as("_w"))
    val integral = {
      import org.apache.spark.sql.types._
      Set[DataType](ByteType, ShortType, IntegerType, LongType)
    }
    require(integral.contains(probe.schema.head.dataType),
      s"topPByGroup weights must be integral counts (got " +
        s"${probe.schema.head.dataType.simpleString}); scale fractional " +
        "scores to an integer grid (e.g. ppm) first — silent truncation " +
        "would break the p-coverage guarantee")
    val base = df.select(col(group).as("_g"), col(id).as("_id"),
      weight.cast("long").as("_w"))
    val totals = base.groupBy("_g").agg(sum(col("_w")).as("_tot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_g")
      .orderBy(col("_w").desc, col("_id").asc)
    base.join(totals, Seq("_g"))
      .withColumn("_cum", sum(col("_w")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("_rank", row_number().over(w))
      .filter((col("_cum") - col("_w")).cast("decimal(38,0)") * 1000000L <
        lit(pPpm) * col("_tot").cast("decimal(38,0)"))
      .select(col("_g").as(group), col("_id").as(id), col("_w").as("weight"),
        col("_cum").as("cum_weight"), col("_rank").cast("long").as("rank"))
  }

  /** √-temperature mixture quotas: per-source sampling targets
    * ∝ supply^(1/2) — the "unigram^τ" practice that upweights scarce
    * domains relative to proportional sampling without letting any
    * one domain dominate (τ = 0.5, the common pretraining-mix
    * default). Unlike [[mixtureQuota]] (which takes HAND-PICKED
    * target weights), the weights here derive from the corpus itself.
    *
    * Exactness argument for the square root, the one float in sight:
    * isqrt(n) is computed as `floor(sqrt(double(n)))`, which is
    * EXACTLY ⌊√n⌋ on every IEEE754 engine for n < 2⁵² — sqrt is
    * correctly rounded, so an error requires (k+1)² − n <
    * (k+1)²·2⁻⁵³, impossible for an integer gap ≥ 1 below 2⁵³, and
    * perfect squares are exact — so the gate compares integers even
    * though a root was taken. Everything downstream is DECIMAL(38,0)
    * cross-multiplication: target_ppm = w·10⁶ div Σw, quota =
    * min(avail, budget·w div Σw), accept_ppm = quota·10⁶ div avail —
    * feed accept_ppm into [[hashBucket256]] acceptance.
    *
    * Plan shape: one map-combined per-source token sum (sources are
    * few by nature), one 1-row Σw broadcast. */
  def sqrtTemperatureQuota(df: DataFrame, source: String, tokens: Column,
                           budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    import graft.ext.IntMath.truncDiv
    val avail = df.groupBy(col(source).as(source))
      .agg(sum(tokens.cast("long")).as("avail_tokens"))
      .withColumn("sqrt_weight",
        floor(sqrt(col("avail_tokens").cast("double"))).cast("long"))
    val tot = avail.agg(sum(col("sqrt_weight")).as("_tw"))
    avail.crossJoin(broadcast(tot))
      .select(col(source), col("avail_tokens"), col("sqrt_weight"),
        truncDiv(col("sqrt_weight").cast("decimal(38,0)") * 1000000L,
          col("_tw")).as("target_ppm"),
        least(col("avail_tokens"),
          truncDiv(col("sqrt_weight").cast("decimal(38,0)") * budgetTokens,
            col("_tw"))).as("quota_tokens"))
      .withColumn("accept_ppm",
        when(col("avail_tokens") > 0,
          truncDiv(col("quota_tokens").cast("decimal(38,0)") * 1000000L,
            col("avail_tokens"))).otherwise(lit(0L)))
  }

  /** DSIR-style importance scores via hashed n-gram features (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): every document of the RAW corpus is scored by how
    * much more likely its hashed unigram+bigram features are under
    * the TARGET corpus' bag-of-features model than under the raw
    * corpus' own — the standard cheap proxy for "select web text that
    * looks like the quality target" without training a classifier.
    *
    * Integer-exact formulation: both models are Laplace-smoothed
    * bucket counts, and a feature in bucket b contributes
    * bits_raw(b) − bits_target(b) where bits_m(b) =
    * floor(log2((total_m + B) / (cnt_m(b) + 1))) — the same
    * binary-digit-count log quantization as
    * [[TextAnalysis.unigramSurprisal]], never a float log, so scores
    * are bit-identical on any engine. Positive score = more
    * target-like (the raw model is more "surprised" by the features
    * than the target model). Feature hashing is md5-derived
    * ([[Planes.subHash]] mod B) — engine-portable like every other
    * hash in the banding family.
    *
    * Plan shape at 100 TB: the two bucket-count models are ≤ B rows
    * each after map-combined aggregation (B is a fixed knob — always
    * broadcastable BY CONSTRUCTION, unlike a vocabulary); scoring is
    * one broadcast join of the raw token stream against the B-row
    * model table plus a map-combined per-doc sum. The target corpus
    * is streamed once, never collected. Returns
    * (doc_id, n_feats, score_bits, score_ppm).
    *
    * `portableHash` picks the feature hash: md5-derived
    * ([[Planes.subHash]], default — cross-engine reproducible, what
    * the x185 oracle mirrors) vs xxhash64 (codegen'd, ~5× cheaper on
    * the token stream — sf1 measured the md5 term as the dominant
    * cost). Scores differ between the two (different bucketing), but
    * each is deterministic; use xxhash64 when only within-Spark
    * reproducibility matters. */
  def dsirWeights(raw: DataFrame, target: DataFrame, id: String,
                  text: String, buckets: Int = 4096,
                  portableHash: Boolean = true): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      "buckets must be in [2, 2^20]")
    import graft.ext.IntMath.truncDiv
    def bucketOf(f: Column): Column =
      if (portableHash) pmod(Planes.subHash(f), lit(buckets.toLong))
      else pmod(xxhash64(f), lit(buckets.toLong))
    // native one-pass n-gram generation ([[graft.functions.TokenNgrams]])
    // — the interpreted HOF bigram form re-evaluates the token split
    // inside the lambda (no subexpression sharing across lambda
    // boundaries), going O(tokens²) per doc: measured 40 s vs 1.3 s
    // on the sf1 feature stream
    def feats(df: DataFrame, keep: Seq[Column]): DataFrame = {
      import graft.functions.TokenNgrams.tokenNgrams
      df.select(keep :+ explode(concat(tokenNgrams(col(text), 1),
        tokenNgrams(col(text), 2))).as("_f"): _*)
        .withColumn("_b", bucketOf(col("_f")))
    }
    def model(df: DataFrame): DataFrame =
      df.groupBy("_b").agg(count(lit(1)).as("_cnt"))
    def bits(cnt: Column, total: Column): Column =
      (length(bin(truncDiv(total + buckets, cnt + 1L))) - 1).cast("long")
    // the raw feature stream feeds BOTH its model and the per-doc
    // scoring join; the feature hash is an md5 per feature (the price
    // of engine portability), so materialize the hashed (doc, bucket)
    // stream once — two longs per feature — instead of hashing twice
    val rawFeats = feats(raw, Seq(col(id).as("doc_id")))
      .select(col("doc_id"), col("_b")).localCheckpoint()
    val tm = model(feats(target, Seq.empty))
    val tTot = tm.agg(sum(col("_cnt")).as("_tt"))
    val rm = model(rawFeats)
    val rTot = rm.agg(sum(col("_cnt")).as("_rt"))
    // bucket table: raw buckets left-joined with target (a bucket the
    // target never hits scores with cnt 0); <= B rows, broadcast
    val table = rm.join(tm.withColumnRenamed("_cnt", "_tcnt"), Seq("_b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("_b"),
        (bits(col("_cnt"), col("_rt")) -
          bits(coalesce(col("_tcnt"), lit(0L)), col("_tt"))).as("_d"))
    rawFeats
      .join(broadcast(table), Seq("_b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("_d")).as("score_bits"))
      .withColumn("score_ppm",
        IntMath.ppmDiv(col("score_bits"), col("n_feats")))
  }

  /** UniMax budget allocation (Chung et al. 2023): split a total
    * training-token budget across languages (or any grouping) so
    * every group is used as EQUALLY as possible without repeating any
    * group past `maxEpochsPpm` epochs of its available supply — the
    * published alternative to temperature mixing that provably
    * minimizes repetition on the tail. Water-filling closed form:
    * with groups sorted by epoch cap ascending, the low-supply prefix
    * is allocated its full cap and the rest share the remaining
    * budget equally; the crossover index is the first group whose cap
    * exceeds its equal share of what is left.
    *
    * All-integer derivation (DECIMAL(38,0) products, trunc division)
    * — bit-identical on any engine; the equal share uses trunc
    * division, so up to (n_uncapped − 1) tokens of the budget remain
    * deliberately unallocated rather than asymmetrically assigned.
    *
    * Plan shape: one map-combined per-group supply sum (group
    * cardinality is small by nature — languages, sources), then the
    * global rank/cumsum over the tiny per-group frame via
    * [[Prefix.globalRunningSums]] (range exchange + offsets — NEVER a
    * single-reducer window, per the suite-wide plan gate) and two
    * 1-row broadcast reductions. Returns (group, supply, cap_tokens,
    * alloc_tokens, epochs_ppm). */
  def unimaxAllocation(df: DataFrame, group: String, supply: Column,
                       budgetTokens: Long, maxEpochsPpm: Long = 1000000L)
      : DataFrame = {
    require(budgetTokens >= 0 && maxEpochsPpm >= 0,
      "budget and epoch cap must be non-negative")
    import graft.ext.IntMath.truncDiv
    val caps = df.groupBy(col(group).as(group))
      .agg(sum(supply.cast("long")).as("supply"))
      .withColumn("cap_tokens",
        truncDiv(col("supply").cast("decimal(38,0)") * maxEpochsPpm,
          lit(1000000L)))
    val ranked = Prefix.globalRunningSums(caps,
      order = Seq(col("cap_tokens"), col(group)),
      values = Seq((lit(1L), "_i"), (col("cap_tokens"), "_cum")))
    val k = ranked.agg(count(lit(1)).as("_k"))
    // capped-prefix condition under the "everything before me is
    // capped" invariant (valid exactly up to the first failure):
    //   cap_i * (k - i + 1) <= B - (cum_i - cap_i)
    val cond = col("cap_tokens").cast("decimal(38,0)") *
      (col("_k") - col("_i") + 1L) <=
      lit(budgetTokens).cast("decimal(38,0)") - (col("_cum") - col("cap_tokens"))
    val firstFail = ranked.crossJoin(broadcast(k)).filter(!cond)
      .agg(min(col("_i")).as("_ff"))
    val m = broadcast(firstFail.crossJoin(broadcast(k))
      .select(coalesce(col("_ff") - 1L, col("_k")).as("_m")))
    val cumcapM = broadcast(ranked.crossJoin(m)
      .filter(col("_i") <= col("_m"))
      .agg(coalesce(max(col("_cum")), lit(0L)).as("_cc")))
    ranked.crossJoin(broadcast(k)).crossJoin(m).crossJoin(cumcapM)
      .withColumn("alloc_tokens",
        when(col("_i") <= col("_m"), col("cap_tokens"))
          .otherwise(truncDiv(
            (lit(budgetTokens).cast("decimal(38,0)") - col("_cc")),
            greatest(col("_k") - col("_m"), lit(1L)))))
      .withColumn("epochs_ppm",
        when(col("supply") > 0,
          IntMath.ppmDiv(col("alloc_tokens"), col("supply"))))
      .select(col(group), col("supply"), col("cap_tokens").cast("long"),
        col("alloc_tokens").cast("long"), col("epochs_ppm"))
      .toDF(group, "supply", "cap_tokens", "alloc_tokens", "epochs_ppm")
  }
}
