package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operators: as-of join and sessionization.
  *
  * The as-of join follows the preference order from the design brief:
  * it COMPOSES built-in operators (union + one window pass) rather
  * than adding a custom physical operator — a single shuffle on the
  * key, no range-join blowup, and Catalyst keeps full visibility.
  * Semantics: for each left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (inclusive; ties broken
  * toward the right row, then by `tieBreak`).
  */
object Temporal {

  /** As-of join via tagged union + running last_value.
    *
    * @param payload right-side columns to carry onto left rows
    *                (emitted as `asof_<name>`, null when no right row
    *                precedes the left row)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               tieBreak: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal ts → inclusive match; right
    // rows carry only key/ts/tieBreak plus their payload struct, left
    // rows keep their full schema (right-side gaps null-filled)
    val l = left.withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(p =>
          org.apache.spark.sql.types.StructField(p,
            right.schema(p).dataType, nullable = true)))))
    val r = right.select(
      col(key), col(ts), col(tieBreak), lit(0).as("_side"),
      struct(payload.map(col): _*).as("_p"))
    val tagged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = tagged
      .withColumn("_last", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payload.foldLeft(enriched) { (df, p) =>
      df.withColumn(s"asof_$p", col(s"_last.$p"))
    }.select((leftCols.map(col) ++ payload.map(p => col(s"asof_$p"))): _*)
  }

  /** Gap-based sessionization via Spark's session_window: events on
    * the same key within `gap` of each other merge into one session.
    * Returns one row per (key, session) with start, size and an exact
    * value sum. */
  def sessionize(events: DataFrame, key: String, ts: String, value: String,
                 gap: String): DataFrame =
    events
      .groupBy(col(key), session_window(col(ts), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col(key), col("w.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Top session paths (the "common journeys" clickstream report):
    * gap-sessionize per key with the same diff ≤ gap convention as
    * [[sessionize]] — lag-derived here so every EVENT carries its
    * session id, which the aggregated session_window form cannot give
    * — then take each session's first `maxSteps` event types in time
    * order (`tieBreak` settles equal timestamps), join them with '>',
    * and count sessions per path.
    *
    * Scale shape: two key-bounded windows (per key, then per
    * key+session — user event counts bound both partitions), ONE
    * bounded collect of ≤ maxSteps structs per session (never the
    * whole session — power users can't blow a reducer), a
    * map-combined path count, and a TakeOrdered top-n at a total
    * order (count desc, path asc). */
  def sessionPaths(events: DataFrame, key: String, ts: String, typ: String,
                   tieBreak: String, gap: String, maxSteps: Int,
                   topN: Int): DataFrame = {
    require(maxSteps > 0 && topN > 0, "maxSteps and topN must be positive")
    val ev = events.select(col(key).as("_k"), col(ts).as("_ts"),
      col(typ).as("_ty"), col(tieBreak).as("_tb"))
    val wu = Window.partitionBy("_k").orderBy(col("_ts"), col("_tb"))
    val tagged = ev
      .withColumn("_brk",
        when(col("_ts") - lag(col("_ts"), 1).over(wu) <=
          expr(s"INTERVAL $gap"), lit(0)).otherwise(lit(1)))
      .withColumn("_sess", sum(col("_brk"))
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("_k"), col("_sess"))
      .orderBy(col("_ts"), col("_tb"))
    val steps = tagged.withColumn("_rn", row_number().over(ws))
      .filter(col("_rn") <= maxSteps)
    val paths = steps.groupBy(col("_k"), col("_sess"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("_rn"), col("_ty")))),
        p => p("_ty"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** Trailing time-window aggregates: for every event, the count and
    * exact decimal sum of the same key's `value` over the preceding
    * `windowSec` seconds, current row inclusive — the rolling
    * "activity in the last hour" feature family.
    *
    * The frame is a RANGE over MICROSECOND epochs (`unix_micros`),
    * not truncated seconds — event data keeps sub-second precision
    * and a seconds-truncated frame silently widens the window by up
    * to a second. RANGE frames are value-determined, so rows with
    * equal (key, ts) are peers sharing one frame: the result is
    * partition-order independent by construction. One key-bounded
    * window, sum pinned to DECIMAL(18,2). */
  def trailingWindow(events: DataFrame, key: String, ts: String,
                     value: String, tieBreak: String,
                     windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val w = Window.partitionBy(col(key))
      .orderBy(unix_micros(col(ts).cast("timestamp")))
      .rangeBetween(-windowSec * 1000000L, 0L)
    events.select(col(key), col(tieBreak), col(ts), col(value))
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum",
        sum(col(value).cast("decimal(18,2)")).over(w).cast("double"))
      .drop(value)
  }

  /** Interval-producing variant of [[sessionize]]: one row per
    * (key, session) with the INCLUSIVE event-time span
    * [session_start, session_end] (first and last event ts — not the
    * gap-extended window end) — the natural left side of a
    * point-in-interval join. */
  /** Rolling robust anomaly flags: each observation is judged against
    * the MEDIAN and MAD (median absolute deviation) of its own
    * trailing window — the self-calibrating spike detector for
    * per-entity metric streams (ingest volumes, per-domain crawl
    * rates, per-user event values), robust where rolling mean/stddev
    * is wrecked by the very outliers it should flag.
    *
    * Integer-exact: values are longs (cast upstream — cents, counts),
    * medians are the LOWER median of the trailing value list (always
    * an actual data value, no interpolation), and the decision
    * |v − med| · 1 > k · MAD is an integer cross-multiplication. Rows
    * with fewer than `minPrior` predecessors emit null flags (no
    * evidence, no verdict). The current row is EXCLUDED from its own
    * window — an outlier must not vote on its own normality.
    *
    * Plan shape: one per-key window (keys spread across reducers —
    * never a global order) materializing ≤ `window` trailing values
    * per row; median/MAD are in-row sort_array + element_at over that
    * bounded array, codegen-friendly HOFs. Cost is O(rows · window) —
    * the honest price of an exact rolling median; `window` is a small
    * constant (24, 168) by construction.
    *
    * Adds (roll_n, roll_med, roll_mad, is_anomaly). `tieBreak` must
    * make (ts, tieBreak) unique per key. */
  def rollingMadFlags(events: DataFrame, key: String, ts: String,
                      tieBreak: String, value: Column, window: Int,
                      minPrior: Int, k: Int): DataFrame = {
    require(window >= 1 && minPrior >= 1 && k >= 1,
      "window, minPrior, k must be positive")
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(tieBreak))
      .rowsBetween(-window, -1)
    def lowerMedian(arr: Column): Column =
      element_at(sort_array(arr), ((size(arr) + 1) / 2).cast("int"))
    events
      .withColumn("_v", value.cast("long"))
      .withColumn("_arr", collect_list(col("_v")).over(w))
      .withColumn("roll_n", size(col("_arr")).cast("long"))
      // empty-window guard: element_at(…, 0) is an error under ANSI
      .withColumn("roll_med",
        when(col("roll_n") > 0, lowerMedian(col("_arr"))))
      .withColumn("roll_mad", when(col("roll_n") > 0, lowerMedian(
        transform(col("_arr"), x => abs(x - col("roll_med"))))))
      .withColumn("is_anomaly",
        when(col("roll_n") >= minPrior,
          abs(col("_v") - col("roll_med")) > lit(k.toLong) * col("roll_mad")))
      .drop("_arr", "_v")
  }

  /** Per-key lag autocorrelation of hourly activity, as exact Pearson
    * components — the periodicity detector behind bot/crawler
    * screening (a scripted client's 24h-lag autocorrelation of its
    * hourly event counts is near 1; organic traffic decorrelates) and
    * seasonality checks before drift alerts fire on a daily rhythm.
    *
    * Exact integers: hourly counts are integers; for each key the
    * (count_h, count_{h−lag}) pairs over the OBSERVED-hour overlap
    * feed r = num / √(den_x·den_y) with num = n·Σxy − Σx·Σy etc. —
    * emitted as components (the caller takes one IEEE sqrt; every
    * accumulation is exact). Missing hours are absent rows, not
    * zeros — gap-fill upstream ([[gapFill]]) when silence should
    * count as zero activity.
    *
    * Plan shape: one map-combined (key, hour) count, one equi-join of
    * the hourly frame against itself shifted by `lagHours` (both
    * sides shuffle on (key, hour) — no window at all), one map-
    * combined per-key reduce. Keys with < 2 overlapping pairs or
    * zero variance emit den 0 — undefined, surfaced not hidden. */
  def lagAutocorr(events: DataFrame, key: String, ts: String,
                  lagHours: Int): DataFrame = {
    require(lagHours >= 1, "lagHours must be positive")
    val hourly = events
      .groupBy(col(key).as("_k"),
        date_trunc("hour", col(ts).cast("timestamp")).as("_h"))
      .agg(count(lit(1)).as("_c"))
    val shifted = hourly.select(col("_k"),
      (col("_h") + expr(s"INTERVAL $lagHours HOURS")).as("_h"),
      col("_c").as("_cl"))
    hourly.join(shifted, Seq("_k", "_h"))
      .groupBy(col("_k").as(key))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_c")).as("_sx"), sum(col("_cl")).as("_sy"),
        sum(col("_c") * col("_c")).as("_sxx"),
        sum(col("_cl") * col("_cl")).as("_syy"),
        sum(col("_c") * col("_cl")).as("_sxy"))
      .select(col(key), col("n_pairs"),
        (col("n_pairs") * col("_sxy") - col("_sx") * col("_sy")).as("r_num"),
        (col("n_pairs") * col("_sxx") - col("_sx") * col("_sx")).as("den_x"),
        (col("n_pairs") * col("_syy") - col("_sy") * col("_sy")).as("den_y"))
  }

  def sessionSpans(events: DataFrame, key: String, ts: String, gap: String)
      : DataFrame =
    events
      .groupBy(col(key), session_window(col(ts), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), max(col(ts)).as("_last"))
      .select(col(key),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("_last").cast("timestamp_ntz").as("session_end"),
        col("n_events"))

  /** Point-in-interval (range) join, bucketed: pairs each point with
    * every interval of the same key containing it (inclusive bounds).
    *
    * A raw `p.ts BETWEEN i.start AND i.end` theta-join gives Catalyst
    * no equi-key, so it plans a BroadcastNestedLoopJoin —
    * O(|points| · |intervals|) and an OOM broadcast at scale. Here
    * intervals explode to the fixed-width time buckets they overlap
    * and points map to their single bucket, making the match an
    * equi-join on (key, bucket) + an exact BETWEEN residual — shuffled,
    * AQE-planned, near-linear. Choose `bucketWidthSec` near the typical
    * interval length: expansion is interval_len/width + 1 rows per
    * interval, while a too-wide bucket co-groups unrelated time ranges.
    *
    * Intervals carry `iPayload` columns onto matching points as
    * `ival_<name>`; points in no interval are dropped (inner join), and
    * overlapping intervals yield one row per containing interval.
    *
    * The same rewrite also exists as the transparent optimizer rule
    * [[graft.plans.RangeJoinRule]] (enable with
    * `spark.graft.rangeJoin.bucketSeconds`), which catches raw
    * BETWEEN theta-joins written without this helper. */
  def pointInIntervalJoin(points: DataFrame, pKey: String, pTs: String,
                          intervals: DataFrame, iKey: String, iStart: String,
                          iEnd: String, bucketWidthSec: Long,
                          iPayload: Seq[String]): DataFrame = {
    require(bucketWidthSec > 0, "bucket width must be positive")
    // NTZ-safe epoch bucketing: TIMESTAMP_NTZ has no direct BIGINT
    // cast; relabel through TIMESTAMP first (identity in the UTC
    // session). Bucket ids only need consistency, not wall-clock truth.
    def bucket(c: Column): Column =
      floor(c.cast("timestamp").cast("long") / bucketWidthSec)
    val p = points.withColumn("_pb", bucket(col(pTs)))
    val i = intervals.select(
        col(iKey).as("_ik"), col(iStart).as("_is"), col(iEnd).as("_ie"),
        struct(iPayload.map(col): _*).as("_ip"))
      // an inverted interval (end < start) contains no point, but
      // sequence() would COUNT DOWN through every bucket between the
      // reversed bounds — drop such rows before the explode
      .filter(col("_ie") >= col("_is"))
      .withColumn("_ib",
        explode(sequence(bucket(col("_is")), bucket(col("_ie")))))
    val joined = p.join(i,
      col(pKey) === col("_ik") && col("_pb") === col("_ib") &&
        col(pTs) >= col("_is") && col(pTs) <= col("_ie"))
    iPayload.foldLeft(joined) { (df, c) =>
        df.withColumn(s"ival_$c", col(s"_ip.$c"))
      }
      .drop("_pb", "_ik", "_is", "_ie", "_ip", "_ib")
  }

  /** Interval×interval PAIR join, bucketed: all overlapping
    * (a, b) interval pairs of the same key, half-open [from, to) —
    * the enumerating sibling of [[concurrentIntervals]] (use THAT
    * when only counts are needed: pair output is inherently quadratic
    * on dense keys, counts are always linear).
    *
    * A raw `a.from < b.to AND b.from < a.to` theta-join has no
    * equi-key and plans a nested-loop. Here both sides explode to the
    * fixed-width time buckets they span — [s, e) touches buckets
    * ⌊s/w⌋..⌊(e−1)/w⌋ — and the match becomes an equi-join on
    * (key, bucket) + the exact overlap residual. A pair sharing many
    * buckets would duplicate, so each pair is emitted ONLY in its
    * OWNER bucket ⌊max(a_from, b_from)/w⌋ — the first bucket where
    * both are live, which both sides provably carry — an exact
    * dedup with no distinct() pass.
    *
    * Scale: shuffle volume is Σ span/w + n per side (choose `w` near
    * the typical interval length); matching is per-(key, bucket).
    * Returns (key, aId, bId, overlap_units). */
  def intervalJoin(a: DataFrame, aId: String, b: DataFrame, bId: String,
                   key: String, from: String, to: String,
                   bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucket width must be positive")
    def bucket(c: Column): Column = floor(c / bucketWidthSec).cast("long")
    def prep(df: DataFrame, id: String, ps: String, pe: String) =
      df.select(col(key).as("_k"), col(id),
          col(from).cast("long").as(ps), col(to).cast("long").as(pe))
        .filter(col(ps) < col(pe))
        .withColumn("_b", explode(sequence(bucket(col(ps)),
          bucket(col(pe) - 1))))
    val ea = prep(a, aId, "_as", "_ae")
    val eb = prep(b, bId, "_bs", "_be")
    ea.join(eb, Seq("_k", "_b"))
      .filter(col("_as") < col("_be") && col("_bs") < col("_ae") &&
        col("_b") === bucket(greatest(col("_as"), col("_bs"))))
      .select(col("_k").as(key), col(aId), col(bId),
        (least(col("_ae"), col("_be")) -
          greatest(col("_as"), col("_bs"))).as("overlap_units"))
  }

  /** Ordered multi-stage funnel: for each user, the earliest time of
    * stage 1, then the earliest stage-2 event STRICTLY after it, then
    * the earliest stage-3 event strictly after that, … — the product
    * analytics primitive (view → click → purchase conversion), and a
    * deterministic MATCH_RECOGNIZE-lite. The iterated-min formulation
    * is what makes it exact: a user who clicks before ever viewing
    * does not convert, and re-orderings inside a stage cannot change
    * the chain (min is duplicate- and order-insensitive).
    *
    * Output: one row per user that reached stage 1 — (user_id, depth,
    * t1..tn), depth = number of stages reached, unreached stage times
    * null.
    *
    * Plan shape at scale: one filtered map-combined min-aggregation
    * per stage plus one equi-join per stage on the user key — stage
    * frames shrink monotonically (funnel property), so each successive
    * join is smaller; nothing is ever sorted and no per-user event
    * list is materialized (the collect_list-then-scan formulation
    * breaks on power users; this one cannot).
    *
    * `windowSec` adds the MATCH_RECOGNIZE `WITHIN` bound: every later
    * stage must land within that many seconds of t1 — the conversion
    * window, ANCHORED AT THE USER'S FIRST stage-1 event (the cohort
    * convention; under a fixed anchor, taking each stage's earliest
    * admissible event is provably optimal — any later choice only
    * shrinks the room left under the deadline — so iterated-min stays
    * exact). */
  def funnel(events: DataFrame, user: String, ts: String, typ: String,
             stages: Seq[String], windowSec: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val ev = events.select(col(user).as("user_id"), col(ts).as("ts"),
      col(typ).as("typ"))
    var reached = ev.filter(col("typ") === stages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev =
        if (i == 1) reached.select(col("user_id"), col("t1"))
        else reached.select(col("user_id"), col(s"t$i"), col("t1"))
      val inWindow = windowSec.fold(lit(true))(w =>
        col("ts") <= expr(s"timestampadd(SECOND, $w, t1)"))
      val next = ev.filter(col("typ") === st)
        .join(prev, "user_id")
        .filter(col("ts") > col(s"t$i") && inWindow)
        .groupBy("user_id").agg(min(col("ts")).as(s"t${i + 1}"))
      reached = reached.join(next, Seq("user_id"), "left")
    }
    val depth = (2 to stages.size).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, 1L).otherwise(0L)
    }
    reached.select(
      col("user_id") +: depth.as("depth") +:
        (1 to stages.size).map(i => col(s"t$i").cast("timestamp_ntz")
          .as(s"t$i")): _*)
  }

  /** Day-N retention cohorts: users are grouped by their first active
    * date (the cohort); each (cohort, day-offset) cell counts the
    * cohort's users active that many days later — the standard
    * engagement/retention matrix, and for training-data pipelines the
    * freshness profile of a source (how long after first crawl a
    * domain keeps producing documents).
    *
    * Plan shape: one distinct over (user, date) — the only shuffle
    * proportional to activity volume, and it is map-combined — then a
    * min-agg per user, one user-key equi-join, and a map-combined
    * count per (cohort, offset) cell. Counting plain rows, not
    * DISTINCT users, is safe because (user, date) is already unique
    * upstream — the join cannot re-duplicate it. */
  def retention(events: DataFrame, user: String, ts: String): DataFrame = {
    val act = events.select(col(user).as("u"), to_date(col(ts)).as("d"))
      .distinct()
    val cohort = act.groupBy("u").agg(min(col("d")).as("c"))
    act.join(cohort, "u")
      .select(col("c").as("cohort_date"),
        datediff(col("d"), col("c")).cast("long").as("day_offset"))
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user event-type transition counts — the Markov first-order
    * statistics behind behavioral embeddings, next-event prediction
    * features and funnel discovery (where [[funnel]] checks a GIVEN
    * stage sequence, this surfaces which transitions exist at all).
    *
    * Consecutive-event pairs per user in time order via one `lag`
    * window (partitioned by user — bounded partitions, never global),
    * then a map-combined count per (from, to). The tie order inside
    * equal timestamps is made total with the event id, so the
    * transition multiset is deterministic. */
  def transitionCounts(events: DataFrame, user: String, ts: String,
                       typ: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(user))
      .orderBy(col(ts), col(tieBreak))
    events
      .select(col(user), col(ts), col(tieBreak), col(typ).as("to_type"),
        lag(col(typ), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Mann–Kendall monotone-trend test per key — the nonparametric
    * "is this really trending" companion to the least-squares slope
    * (x103): S = Σ_{i<j} sign(v_j − v_i) over the time-ordered
    * series, entirely in integers (no residuals, no float variance).
    * Reported with the tie-corrected variance NUMERATOR
    * var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) (the classical
    * variance is var18/18): the z-score S/√(var18/18) is one
    * off-engine square root away, while everything the engines must
    * agree on stays exact. |S| near its max n(n−1)/2 ⇒ strictly
    * monotone; near 0 ⇒ no trend.
    *
    * Plan shape: the raw stream first collapses to per-(key, bucket)
    * sums (the only event-volume aggregation). S itself is NOT a
    * pair join: among the non-null time-ordered values,
    * S = C(nn,2) − ties − 2·inversions, so one per-key sort +
    * merge-sort inversion count ([[graft.functions.InversionCount]],
    * O(H log H)) replaces the O(H²) pair enumeration — a 3-year
    * hourly key is ~26k points ⇒ ~350M pairs under the join,
    * ~470k comparisons here. Ties reduce map-side; the per-key
    * series collect is bounded by the time span (hour buckets),
    * never by event volume — a 10-year hourly key is ~88k structs
    * (~2 MB executor-side), so no span cap is needed where the
    * pairwise [[theilSen]] must coarsen. Pairs with a NULL bucket sum compare as
    * 0 (they count in n_pairs, not in S; the NULL group ties into
    * var18), matching the pairwise definition. */
  def mannKendall(events: DataFrame, key: String, ts: String,
                  value: Column): DataFrame = {
    val x = (value.cast("decimal(18,2)") * 100).cast("long")
    val hourly = events
      .select(col(key).as("_k"), date_trunc("hour", col(ts)).as("_h"),
        x.as("_x"))
      // rows with a NULL timestamp have no hour bucket: the pairwise
      // definition (hh_a < hh_b) never pairs them, so they are
      // excluded from the series, ties, n and n_pairs alike — keeping
      // the null-_h group would let it sort first in the series and
      // silently bias S vs the pairwise oracle
      .filter(col("_h").isNotNull)
      .groupBy("_k", "_h").agg(sum(col("_x")).as("_v"))
    // (n, #nulls, inversion count of the time-ordered values): the
    // struct sort orders by _h (distinct per key), so the transform
    // yields the series in time order; nn := n − nulls
    val series = hourly.groupBy("_k")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("_nulls"),
        sort_array(collect_list(struct(col("_h"), col("_v")))).as("_sv"))
      .withColumn("_inv", graft.functions.VectorExpressions.inversions(
        transform(col("_sv"), s => s.getField("_v"))))
      .drop("_sv")
    // tie18 keeps the NULL group (it ties in the variance, exactly as
    // the pairwise CASE yields 0); tie2 is the S-correction and counts
    // only ties among comparable (non-null) values
    val ties = hourly.groupBy("_k", "_v").agg(count(lit(1)).as("_t"))
      .groupBy("_k")
      .agg(sum(col("_t") * (col("_t") - 1) * (col("_t") * 2 + 5))
        .as("_tie18"),
        sum(when(col("_v").isNull, lit(0L)).otherwise(
          IntMath.truncDiv(col("_t") * (col("_t") - 1), lit(2L))))
          .as("_tie2"))
    val nn = col("n") - col("_nulls")
    series.join(ties, Seq("_k"))
      .select(col("_k").as(key), col("n"),
        IntMath.truncDiv(col("n") * (col("n") - 1), lit(2L))
          .as("n_pairs"),
        (IntMath.truncDiv(nn * (nn - 1), lit(2L)) - col("_tie2") -
          col("_inv") * 2).as("s_stat"),
        (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("_tie18"))
          .as("var18"))
  }

  /** Exact overlap between two interval SETS per key — "how much of
    * each user's session time fell inside maintenance windows",
    * "downtime ∩ business hours" — via a boundary SWEEP, not an
    * interval pair join: both sets melt to ±1 boundary deltas,
    * per-(key, t) deltas collapse map-side, two running sums give
    * each set's active depth, and a segment [t, next_t) counts when
    * BOTH depths are positive. Intervals are half-open [from, to);
    * overlapping intervals WITHIN a set are handled correctly
    * (depth > 0 is membership, not depth arithmetic). Returns one
    * row per key with any overlap: (key, overlap_units,
    * n_segments) — n_segments counts boundary-delimited active
    * segments, so two abutting windows report as their subdivided
    * parts.
    *
    * A pair range-join computes the same thing in O(|A|·|B|) per hot
    * key and needs overlap-dedup for nested intervals; the sweep is
    * O((|A|+|B|) log) per key with no pair blowup — the windows are
    * KEY-partitioned (bounded per key, never global). */
  def intervalOverlap(a: DataFrame, b: DataFrame, key: String,
                      from: String, to: String): DataFrame = {
    def melt(df: DataFrame, sa: Long, sb: Long, at: String) =
      df.select(col(key).as("_k"), col(at).cast("long").as("_t"),
        lit(sa).as("_da"), lit(sb).as("_db"))
    val bounds = melt(a, 1L, 0L, from).unionAll(melt(a, -1L, 0L, to))
      .unionAll(melt(b, 0L, 1L, from)).unionAll(melt(b, 0L, -1L, to))
      .groupBy(col("_k"), col("_t"))
      .agg(sum(col("_da")).as("_da"), sum(col("_db")).as("_db"))
    val run = Window.partitionBy(col("_k")).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nxt = Window.partitionBy(col("_k")).orderBy(col("_t"))
    bounds
      .withColumn("_ca", sum(col("_da")).over(run))
      .withColumn("_cb", sum(col("_db")).over(run))
      .withColumn("_next", lead(col("_t"), 1).over(nxt))
      .filter(col("_next").isNotNull && col("_ca") > 0 && col("_cb") > 0)
      .groupBy(col("_k").as(key))
      .agg(sum(col("_next") - col("_t")).as("overlap_units"),
        count(lit(1)).as("n_segments"))
  }

  /** Theil–Sen robust slope per key — the estimator behind
    * [[mannKendall]]'s test: the LOWER MEDIAN of all pairwise slopes
    * (v_j−v_i)/(h_j−h_i) over the hourly series, insensitive to
    * ~29% outliers where the least-squares slope (x103) is wrecked
    * by one spike. The median element is selected by ordering on the
    * IEEE-double ratio (a single correctly-rounded division — both
    * engines produce the identical double) with the exact integer
    * (num, den) pair as tiebreaker, and is REPORTED as that exact
    * fraction (cents per hour: med_num/med_den) plus a milli
    * rendering — so the gate compares integers, not floats.
    *
    * Plan shape: like [[mannKendall]] — event volume collapses to
    * (key, hour) sums first; the pair self-join and the per-key
    * median window are bounded by the time span, never by event
    * volume.
    *
    * SPAN CAP: the estimator is inherently pairwise — a 3-year hourly
    * key is ~26k buckets ⇒ ~350M pairs on ONE key if left unguarded.
    * Keys whose hour span exceeds `maxBuckets` are deterministically
    * COARSENED before pairing: per-key stride s = ceil(span /
    * maxBuckets), hours re-bucket to floor((e − min_e) / s) (the
    * hourly sums add — the same collapse the hourly step already
    * applies to raw events, one level up), so the distinct buckets
    * per key are provably ≤ maxBuckets and the per-key pair volume
    * is capped at C(maxBuckets, 2). Slopes stay in per-HOUR units
    * (den carries coarse-steps × s); within-cap keys take s = 1,
    * where the coarsening is the identity and the output is
    * bit-identical to the uncapped estimator. The capped estimate is
    * the Theil–Sen slope of the stride-aggregated series — a
    * documented approximation for pathological spans, not a silent
    * truncation. */
  def theilSen(events: DataFrame, key: String, ts: String,
               value: Column, maxBuckets: Int = 4096): DataFrame = {
    require(maxBuckets >= 2, "maxBuckets must be at least 2")
    val x = (value.cast("decimal(18,2)") * 100).cast("long")
    // hourly feeds the span probe AND the coarse re-bucket:
    // materialize so raw events are scanned once
    val hourly = events
      .select(col(key).as("_k"), date_trunc("hour", col(ts)).as("_h"),
        x.as("_x"))
      .groupBy("_k", "_h").agg(sum(col("_x")).as("_v"))
      .withColumn("_e", (unix_micros(col("_h").cast("timestamp")) /
        lit(3600000000L)).cast("long"))
      .localCheckpoint()
    // stride: ceil((max−min+1) / maxBuckets) = (max−min+maxBuckets)
    // div maxBuckets; one tiny row per key, equi-joined back
    val spans = hourly.groupBy("_k")
      .agg(min(col("_e")).as("_e0"),
        IntMath.truncDiv(max(col("_e")) - min(col("_e")) + maxBuckets,
          lit(maxBuckets.toLong)).as("_s"))
    val coarse = hourly.join(spans, Seq("_k"))
      .groupBy(col("_k"), col("_s"),
        IntMath.truncDiv(col("_e") - col("_e0"), col("_s")).as("_ce"))
      .agg(sum(col("_v")).as("_v"))
    val pairs = coarse.as("a").join(coarse.as("b"),
        col("a._k") === col("b._k") && col("a._ce") < col("b._ce"))
      .select(col("a._k").as("_k"),
        (col("b._v") - col("a._v")).as("_num"),
        ((col("b._ce") - col("a._ce")) * col("a._s")).as("_den"))
    val w = Window.partitionBy(col("_k"))
      .orderBy((col("_num").cast("double") / col("_den")).asc,
        col("_num").asc, col("_den").asc)
    pairs
      .withColumn("_rn", row_number().over(w))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(col("_k"))))
      .filter(col("_rn") === floor((col("_m") + 1) / 2).cast("long"))
      .select(col("_k").as(key), col("_m").as("n_pairs"),
        col("_num").as("med_num"), col("_den").as("med_den"),
        IntMath.truncDiv(col("_num") * lit(1000L), col("_den"))
          .as("slope_milli"))
  }

  /** Point-in-time (PIT) feature join — the feature-store operation
    * that prevents training-serving skew: each fact row joins the
    * dimension VERSION whose validity window [from, to) contained the
    * fact's timestamp, never the current version (that leaks the
    * future into training features). `to` null means the open current
    * version. Facts with no valid version survive with null features
    * (left join) — the honest representation of "this entity had no
    * state yet".
    *
    * Plan shape: an EQUI-join on the entity key with the validity
    * range as a residual filter — a hash/sort-merge join, never a
    * nested loop, because the equality conjunct anchors it; per-key
    * version counts are SCD2-bounded, so the residual scan per
    * matched key is small. This is [[asofJoin]]'s interval-keyed
    * sibling: as-of sorts and picks the latest ≤ ts; PIT trusts the
    * SCD2 bookkeeping's non-overlapping windows. */
  def pointInTimeJoin(facts: DataFrame, factKey: String, factTs: String,
                      dims: DataFrame, dimKey: String, from: String,
                      to: String): DataFrame =
    facts.join(dims,
      facts(factKey) === dims(dimKey) &&
        facts(factTs) >= dims(from) &&
        (dims(to).isNull || facts(factTs) < dims(to)),
      "left")

  /** Per-key sequence surprisal under the CORPUS transition model —
    * "which users behave unlike everyone" ([[transitionEntropy]]
    * summarizes the model; this scores each key against it): every
    * observed transition from state s with model count c out of s's
    * total outflow S contributes floor(log2(S div c)) Zipf-bucket
    * bits; a key reports its transition count, bit sum, and
    * bits-per-transition in ppm. Scripted/bot streams score near
    * zero; erratic streams score high — the behavioural analogue of
    * [[graft.ext.TextAnalysis.unigramSurprisal]].
    *
    * Plan shape: [[transitionCounts]]' bounded per-key lag window to
    * enumerate the key's transitions, one join against the tiny
    * (from, to) model table, one map-combined per-key reduce. */
  def sequenceSurprisal(events: DataFrame, user: String, ts: String,
                        typ: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(user)).orderBy(col(ts), col(tieBreak))
    // ONE lag pass enumerates the transitions; the corpus model is a
    // groupBy of the same frame (localCheckpoint so the event-volume
    // window isn't executed twice — once for rows, once for the model)
    val trans = events
      .select(col(user).as("_u"), col(typ).as("to_type"),
        lag(col(typ), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .localCheckpoint()
    val model = trans.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val out = model.groupBy("from_type").agg(sum(col("n_transitions")).as("_s"))
    trans
      .join(model, Seq("from_type", "to_type"))
      .join(out, Seq("from_type"))
      .withColumn("_bits",
        (length(bin(expr("_s div n_transitions"))) - 1).cast("long"))
      .groupBy(col("_u").as(user))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("_bits")).as("bits_sum"))
      .withColumn("surprisal_ppm", expr("bits_sum * 1000000 div n_transitions"))
  }

  /** Out-of-orderness (watermark lateness) profile: for each event,
    * how far its EVENT time lags the maximum event time already seen
    * in ARRIVAL order within its key, bucketed by log₂ microseconds —
    * the measurement that picks a Structured Streaming watermark
    * (`withWatermark("ts", X)`): the profile's tail IS the
    * late-data-loss curve for any candidate X. Bucket −1 counts
    * exactly-in-order events; bucket b counts events late by
    * [2^b, 2^(b+1)) µs; `max_late_us` per bucket pins the worst case.
    * The log₂ bucket is the engine-portable binary-digit-count
    * (`length(bin(x)) − 1`) used by every quantized operator here.
    *
    * Plan shape: one running-max window PARTITIONED BY KEY in arrival
    * order (bounded per-key partitions), one map-combined bucket
    * aggregation. */
  def latenessProfile(events: DataFrame, key: String, ts: String,
                      arrival: String): DataFrame = {
    val us = unix_micros(col(ts).cast("timestamp"))
    val w = Window.partitionBy(col(key)).orderBy(col(arrival))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(key), col(arrival), us.as("_us"))
      .withColumn("_late", max(col("_us")).over(w) - col("_us"))
      .withColumn("bucket",
        when(col("_late") === 0L, lit(-1L))
          .otherwise((length(bin(col("_late"))) - 1).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), max(col("_late")).as("max_late_us"))
  }

  /** Rolling N-day active users (DAU/WAU-style) — for every day with
    * any activity, the count of distinct users active in the
    * `windowDays`-day window ENDING that day. The textbook hard case
    * for sliding-window distinct counting: a plain GROUP BY cannot
    * express it (a user active twice in the window must count once),
    * and per-day re-scans are quadratic.
    *
    * Shape: the event stream first collapses to distinct (user, day)
    * pairs (ONE map-combined distinct — the only aggregation
    * proportional to event volume); each pair then covers its next
    * `windowDays` days via an in-row `sequence` explode (bounded ×W
    * blowup of the already-tiny user-day frame), a second distinct
    * collapses multi-day users inside each window, and a count per
    * day finishes. Days with no activity of their own are dropped by
    * an equi-join against the active-day list (an "as of day X"
    * readout for a day the system was dark is not meaningful). */
  def rollingActiveUsers(events: DataFrame, ts: String, user: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370,
      "windowDays must be in [1, 370]")
    val ud = events.select(to_date(col(ts)).as("d"), col(user).as("u"))
      .distinct()
    val days = ud.select(col("d").as("day")).distinct()
    val dau = ud.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val cov = ud
      .select(explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1))).as("day"), col("u"))
      .join(days, "day")
      .distinct()
    val wau = cov.groupBy("day").agg(count(lit(1)).as("rolling_active"))
    dau.join(wau, "day").orderBy("day")
  }

  /** CUSUM mean-shift scan per key — "WHEN did this user/feed/sensor
    * change behaviour", the time-localized companion to the
    * distribution-level drift tests ([[graft.ext.Drift]] says THAT
    * two samples differ; this points at the moment). For each key the
    * cumulative deviation from the key's own mean is
    * S_t = Σ_{i≤t}(x_i − T/n); the reported statistic is the integer
    * scaling n·S_t = n·cum_t − t·T (exact — no division at all), its
    * max |·| over t, and the timestamp achieving it (earliest on
    * ties) — the classic CUSUM changepoint estimate. Values are
    * pinned to cents (DECIMAL(18,2)·100) so sums are exact integers.
    *
    * Plan shape: one map-combined per-key (n, T) aggregation; one
    * running sum over a window PARTITIONED BY KEY (bounded per-key
    * partitions — the honest cost of an ordered scan, never a global
    * window); one max_by-style struct max per key. Scales per key,
    * not per corpus. */
  def cusumChangepoint(events: DataFrame, key: String, ts: String,
                       tieBreak: String, value: Column): DataFrame = {
    val x = (value.cast("decimal(18,2)") * 100).cast("long")
    val base = events.select(col(key).as("k"),
      unix_micros(col(ts).cast("timestamp")).as("us"),
      col(tieBreak).as("tb"), x.as("x"))
    val tot = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
    val w = Window.partitionBy(col("k")).orderBy(col("us"), col("tb"))
    val dev = base
      .select(col("k"), col("us"),
        sum(col("x")).over(w).as("cum"),
        count(lit(1)).over(w).as("i"))
      .join(tot, "k")
      .select(col("k"), col("us"), col("n"),
        (col("n").cast("decimal(28,0)") * col("cum") -
          col("i").cast("decimal(28,0)") * col("t"))
          .cast("decimal(38,0)").as("dev"))
    dev.groupBy("k")
      .agg(first(col("n")).as("n"),
        max(struct(abs(col("dev")).as("a"), (-col("us")).as("nu"),
          col("dev").as("d"))).as("m"))
      .select(col("k").as(key), col("n"),
        col("m.d").cast("long").as("dev_scaled"),
        (-col("m.nu")).cast("long").as("at_us"))
  }

  /** Conditional transition entropy H(next | current) per state —
    * how PREDICTABLE behaviour is from each state, the
    * information-theoretic summary of [[transitionCounts]] (bot/
    * scripted traffic shows near-zero entropy; organic browsing is
    * high). Same engine-portable Zipf-bucket quantization as
    * [[graft.ext.TextAnalysis.tokenEntropy]]: a transition seen c
    * times out of a state's s outgoing events contributes
    * c·floor(log2(s div c)) bits, and `h_ppm` = 10⁶·Σbits div s
    * (micro-bits per transition).
    *
    * Plan shape: [[transitionCounts]]' per-user lag window (bounded
    * partitions), then two map-combined aggregations over the
    * (from, to) count table — which is at most |states|² rows, tiny
    * at any corpus size. */
  def transitionEntropy(events: DataFrame, user: String, ts: String,
                        typ: String, tieBreak: String): DataFrame = {
    val tc = transitionCounts(events, user, ts, typ, tieBreak)
    val out = tc.groupBy("from_type").agg(sum(col("n_transitions")).as("s"))
    tc.join(out, "from_type")
      .withColumn("bits",
        (col("n_transitions") *
          (length(bin(expr("s div n_transitions"))) - 1)).cast("long"))
      .groupBy("from_type")
      .agg(first(col("s")).as("out_total"),
        count(lit(1)).as("n_next_states"),
        sum(col("bits")).as("bits_sum"))
      .withColumn("h_ppm", expr("bits_sum * 1000000 div out_total"))
  }

  /** Dense time-grid gap filling: per-key hourly (count, exact sum)
    * buckets with MISSING HOURS MATERIALIZED AS ZERO ROWS between the
    * key's first and last active hour — the resample/regularize step
    * every downstream time-series consumer (forecasting features,
    * anomaly baselines, rate limiting) needs, and precisely what a
    * plain GROUP BY cannot produce (it has no rows for silent hours).
    *
    * Plan shape at scale: one map-combined hourly aggregation (the
    * only shuffle proportional to event volume), a per-key min/max
    * agg over the ALREADY-AGGREGATED hourly frame, a `sequence()`
    * explode bounded by each key's own active span (never a global
    * calendar cross-join), and one (key, hour) equi-join. A key's
    * grid is proportional to its own lifetime — idle keys cost
    * nothing. */
  def gapFill(events: DataFrame, key: String, ts: String, value: String)
      : DataFrame = {
    val hourly = events
      .groupBy(col(key), date_trunc("hour", col(ts)).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("sum_value"))
    val grid = hourly.groupBy(col(key))
      .agg(min(col("hour")).as("_h0"), max(col("hour")).as("_h1"))
      .select(col(key),
        explode(sequence(col("_h0"), col("_h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    grid.join(hourly, Seq(key, "hour"), "left")
      .select(col(key), col("hour").cast("timestamp_ntz").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Interval union per key (gaps-and-islands): merges overlapping /
    * touching [start, end] intervals into maximal islands and reports
    * per key the interval count, island count and total covered
    * microseconds — true "time on site" under concurrent sessions,
    * SLA coverage from overlapping maintenance windows, crawl-window
    * consolidation. Naive SUM(end-start) double-counts overlap; this
    * is the exact union length.
    *
    * Sweep line as ONE key-bounded window pass: intervals sort by
    * (start, end, tieBreak) — a total order — and a row opens a new
    * island iff its start exceeds the running max end over all prior
    * rows (frame: unbounded preceding → 1 preceding). Island ids are
    * the running sum of those flags; an island's union is contiguous
    * by construction, so its coverage is max(end) − min(start) and
    * per-key totals are one map-combined aggregation away. Bounds are
    * inclusive microsecond instants; adjacent intervals (next.start
    * == prev.end) merge. */
  def intervalCoverage(intervals: DataFrame, key: String, start: String,
                       end: String, tieBreak: String): DataFrame = {
    val iv = intervals.select(col(key).as("_k"),
        unix_micros(col(start).cast("timestamp")).as("_s"),
        unix_micros(col(end).cast("timestamp")).as("_e"),
        col(tieBreak).as("_tb"))
      .filter(col("_e") >= col("_s"))
    val w = Window.partitionBy("_k").orderBy(col("_s"), col("_e"), col("_tb"))
    val islands = iv
      .withColumn("_pm", max(col("_e"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pm").isNull || col("_s") > col("_pm"), 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("_k"), col("_isl"))
      .agg(count(lit(1)).as("_n"),
        (max(col("_e")) - min(col("_s"))).as("_cov"))
      .groupBy(col("_k"))
      .agg(sum(col("_n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_cov")).as("covered_us"))
      .withColumnRenamed("_k", key)
  }

  /** Per-group OLS trend slope as an EXACT INTEGER FRACTION —
    * activity trending up or down per user/source/segment, the
    * screening regression behind burn-down charts and corpus-source
    * health monitors. slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²);
    * both sides stay integers (x = seconds since the group's own
    * first event, y = cents), reported as (slope_num, slope_den) —
    * divide off-engine; sign(slope_num) is the trend verdict. No
    * float ever sums, so the result is bit-identical under any
    * partitioning; a single-point or zero-variance-x group reports
    * den = 0 (undefined slope, consumer decides).
    *
    * Scale: one min-agg + one key equi-join + one map-combined sum
    * per group — scan speed. Overflow: with x ≤ 3·10⁷ s (a year) and
    * cents ≤ 10⁶, n·Σxy needs n ≤ ~10⁴ rows per group before Long
    * pressure; pin to DECIMAL beyond. */
  def trendSlope(events: DataFrame, group: String, ts: String,
                 value: String): DataFrame = {
    val ev = events.select(col(group).as("grp"),
      unix_timestamp(col(ts)).as("t"),
      floor(col(value) * 100 + 0.5).cast("long").as("cents"))
    val t0 = ev.groupBy("grp").agg(min(col("t")).as("t0"))
    ev.join(t0, "grp")
      .select(col("grp"), (col("t") - col("t0")).as("x"), col("cents").as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("grp"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
  }

  /** Half-life–decayed score per group — recency weighting without a
    * single float: freshness signals for corpus curation (recent
    * sources weigh more), engagement scoring, feature snapshots.
    *
    * `exp(-λ·age)` is the textbook form and a cross-engine/-hardware
    * reproducibility hole (transcendental + sum order). Instead the
    * age in `periodSec`-long half-life periods is an INTEGER halving
    * count k (capped at `horizon`), the weight is the exact integer
    * 2^(horizon−k), the value is pinned to cents (floor(v·100+0.5)),
    * and the score is one Long sum: `score_scaled = Σ cents·2^(horizon−k)`
    * — bit-identical under any partitioning or engine. Divide by
    * 100·2^horizon for the unit-score reading; events older than
    * `horizon` half-lives keep weight 1 (monotone floor, never
    * negative-age truncation surprises).
    *
    * The reference time is `max(ts)` over the input (deterministic
    * from data, no wall clock), broadcast as one row. Overflow: cents
    * ≤ 10⁹ and horizon ≤ 20 leave 10⁹·2²⁰ ≈ 10¹⁵ per event — room
    * for 10⁴ such events per Long sum; shard to DECIMAL beyond.
    *
    * Scale shape: one 1-row max broadcast + one map-combined sum per
    * group — scan speed. */
  def decayedScore(events: DataFrame, group: String, ts: String,
                   value: String, periodSec: Long = 86400L,
                   horizon: Int = 20): DataFrame = {
    require(periodSec >= 1 && horizon >= 1 && horizon <= 60,
      "need periodSec >= 1 and 1 <= horizon <= 60")
    val mx = events.agg(max(unix_timestamp(col(ts))).as("mx"))
    events
      .select(col(group).as("grp"), unix_timestamp(col(ts)).as("e"),
        floor(col(value) * 100 + 0.5).cast("long").as("cents"))
      .crossJoin(broadcast(mx))
      .withColumn("k",
        least(lit(horizon.toLong), expr(s"(mx - e) div ${periodSec}L")))
      .withColumn("w",
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($horizon - k AS INT))"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * col("w")).as("score_scaled"))
  }

  /** Per-interval concurrency: for each interval, the EXACT count of
    * other intervals it overlaps — "how many sessions were live while
    * this one ran", capacity planning, contention audits — WITHOUT
    * ever enumerating overlap pairs. Intervals are half-open
    * [from, to); empty/null intervals are dropped.
    *
    * The pair-free identity: with all intervals non-empty,
    * {j : e_j ≤ s_i} ⊆ {j : s_j < e_i}, so
    *
    *   overlaps(i) = #{j : s_j < e_i} − #{j : e_j ≤ s_i} − 1
    *
    * — two GLOBAL order statistics, no join. Both ranks come from one
    * boundary sweep: every interval melts to a start-count row, an
    * end-count row and two query rows; the union is globally ordered
    * by (t, kind) with end-counts < queries < start-counts so that
    * ties realize exactly "< e_i" and "≤ s_i"; two running counts are
    * computed with [[Prefix.globalRunningSums]] (range-partitioned
    * two-phase cumsum — NO single-reducer window); the per-interval
    * subtraction is a final map-combined aggregate.
    *
    * Scale shape: O(n log n) sort-shuffle on 4n skinny rows, output
    * exactly n rows. The naive formulations melt down at 100 TB in
    * two different ways — a pair range-join is O(n²) work on dense
    * data, and even a bucketed pair join has inherently quadratic
    * OUTPUT when everything overlaps (every row online at peak hour
    * overlaps every other). Counting via rank arithmetic sidesteps
    * both: hot spots cost nothing extra because no pair ever
    * materializes. */
  def concurrentIntervals(ivls: DataFrame, id: String, from: String,
                          to: String): DataFrame = {
    val base = ivls.select(col(id).as("_id"),
        col(from).cast("long").as("_s"), col(to).cast("long").as("_e"))
      .filter(col("_s").isNotNull && col("_e").isNotNull &&
        col("_s") < col("_e"))
    def row(t: Column, knd: Int, w: Int, ds: Int, de: Int) =
      base.select(t.as("_t"), lit(knd).as("_knd"), col("_id"),
        lit(w).as("_w"), lit(ds.toLong).as("_ds"), lit(de.toLong).as("_de"))
    val melted = row(col("_e"), 0, 0, 0, 1)          // end-count
      .unionAll(row(col("_s"), 1, 1, 0, 0))          // query: ends ≤ s_i
      .unionAll(row(col("_e"), 1, 2, 0, 0))          // query: starts < e_i
      .unionAll(row(col("_s"), 2, 0, 1, 0))          // start-count
    val summed = Prefix.globalRunningSums(melted,
      Seq(col("_t"), col("_knd"), col("_id"), col("_w")),
      Seq(col("_ds") -> "_cs", col("_de") -> "_ce"))
    summed.filter(col("_knd") === 1)
      .groupBy(col("_id").as(id))
      .agg((sum(when(col("_w") === 2, col("_cs"))
          .otherwise(-col("_ce"))) - 1L).as("n_overlapping"))
  }

}
