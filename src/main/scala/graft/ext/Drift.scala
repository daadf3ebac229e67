package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift detection: which terms shifted between two corpora.
  *
  * Per-term chi-square contribution between the two term relative
  * frequencies: ((cA/tA − cB/tB)² ) / ((cA+cB)/(tA+tB)). Large values
  * flag vocabulary drift — the standard cheap monitor for "did this
  * month's crawl change distribution" before retraining decisions.
  *
  * Determinism: counts and totals are exact integers; each
  * contribution is a fixed dag of IEEE double ops (two divisions, one
  * multiply, one divide — no accumulation, so no float ordering), then
  * rounded to 9 dp. Identical in any engine. Scale: two map-combined
  * term counts + one full-outer join on term; totals ride in as a
  * 1-row broadcast.
  */
object Drift {

  private def counts(df: DataFrame, text: String, name: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as(name))

  private def round9(c: Column): Column = floor(c * 1e9 + 0.5) / 1e9

  /** Pairwise shingle-set overlap between corpus slices — the
    * inter-source duplication audit a mixture designer runs before
    * setting sampling weights (two sources that are 60% the same
    * content should not both get full weight).
    *
    * Exact Jaccard between each pair of groups' distinct word-n-gram
    * sets: one map-combined distinct over (group, shingle), a
    * shingle-keyed self-join producing only co-occurring group pairs,
    * one pair-keyed count. Scale shape: the join fans out at most
    * |groups present on the shingle|² rows per shingle — group
    * cardinality (sources, snapshots, languages) is small by nature,
    * and the shingle posting row is distinct-collapsed BEFORE the
    * join, so corpus volume only enters through the one distinct
    * shuffle. Jaccard is emitted 6-dp-rounded (fixed op dag, engine
    * identical) alongside the exact integer counts.
    *
    * Returns (group_a, group_b, inter, sz_a, sz_b, jaccard) for every
    * unordered group pair sharing at least one shingle. */
  def groupOverlap(df: DataFrame, group: String, text: String,
                   n: Int): DataFrame = {
    val round6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    val gs = df
      .select(col(group).as("g"), explode(Dedup.shingles(col(text), n)).as("sh"))
      .distinct()
    val sizes = gs.groupBy("g").agg(count(lit(1)).as("sz"))
    gs.as("a").join(gs.as("b"),
        col("a.sh") === col("b.sh") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("group_a"), col("b.g").as("group_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("g").as("group_a"), col("sz").as("sz_a")), "group_a")
      .join(sizes.select(col("g").as("group_b"), col("sz").as("sz_b")), "group_b")
      .select(col("group_a"), col("group_b"), col("inter"),
        col("sz_a"), col("sz_b"),
        round6(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
  }

  /** (term, cnt_a, cnt_b, chi2) for every term in either corpus. */
  def termDrift(a: DataFrame, b: DataFrame, text: String): DataFrame = {
    val joined = counts(a, text, "cnt_a")
      .join(counts(b, text, "cnt_b"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = joined.agg(sum(col("cnt_a")).as("tot_a"),
      sum(col("cnt_b")).as("tot_b"))
    joined.join(broadcast(totals))
      .withColumn("_diff",
        col("cnt_a").cast("double") / col("tot_a") -
          col("cnt_b").cast("double") / col("tot_b"))
      .withColumn("_exp",
        (col("cnt_a") + col("cnt_b")).cast("double") /
          (col("tot_a") + col("tot_b")))
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        round9(col("_diff") * col("_diff") / col("_exp")).as("chi2"))
  }

  /** Quantized KL divergence D(A‖B) between two corpora's term
    * distributions — the DIRECTED companion to [[termDrift]]'s
    * symmetric chi-square: "how surprised is a model of corpus B by
    * corpus A", the drift score whose units (bits/token) are directly
    * comparable across corpus pairs and over time. Add-one smoothing
    * over the union vocabulary keeps every ratio finite.
    *
    * Integer-exact via the same floor-log₂ quantization as
    * [[Profile.informationGain]]: per term, the log ratio
    * log₂((cA+1)·N'B / ((cB+1)·N'A)) is bucketed to q_bits =
    * ±⌊log₂⌋ of the integer quotient (sign by which side is larger;
    * exact DECIMAL cross-multiplication, never a float), and the
    * per-term contribution is (cA+1)·q_bits. Σcontrib / N'A is the
    * quantized divergence in bits/token — conservative, engine-exact.
    *
    * Plan shape: two map-combined term counts, one full-outer join on
    * term, totals + union-vocab size as a 1-row broadcast, then
    * in-row integer arithmetic. The corpus enters only through the
    * two count shuffles. */
  def klDriftBits(a: DataFrame, b: DataFrame, text: String): DataFrame = {
    val joined = counts(a, text, "cnt_a")
      .join(counts(b, text, "cnt_b"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = joined.agg(sum(col("cnt_a")).as("tot_a"),
      sum(col("cnt_b")).as("tot_b"), count(lit(1)).as("v"))
    def bits(num: Column, den: Column): Column =
      (length(bin(IntMath.truncDiv(num, den))) - 1).cast("long")
    joined.join(broadcast(totals))
      .withColumn("_num", (col("cnt_a") + 1).cast("decimal(38,0)") *
        (col("tot_b") + col("v")))
      .withColumn("_den", (col("cnt_b") + 1).cast("decimal(38,0)") *
        (col("tot_a") + col("v")))
      .withColumn("q_bits", when(col("_num") >= col("_den"),
          bits(col("_num"), col("_den")))
        .otherwise(lit(0L) - bits(col("_den"), col("_num"))))
      .select(col("term"), col("cnt_a"), col("cnt_b"), col("q_bits"),
        ((col("cnt_a") + 1) * col("q_bits")).as("contrib_bits"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between two numeric
    * samples — the NUMERIC companion to [[termDrift]]: "did this
    * month's price/score/length distribution move" as one number,
    * with no binning choices to argue about.
    *
    * Entirely in integers: at each distinct value v the CDF gap is
    * F_A(v) − F_B(v) = (cumA·nB − cumB·nA) / (nA·nB), so the max of
    * |cumA·nB − cumB·nA| IS the KS numerator over the common
    * denominator nA·nB — reported as (ks_num, n_a, n_b) plus the
    * value achieving it (smallest on ties). D = ks_num/(nA·nB);
    * compare against c(α)·√((nA+nB)/(nA·nB)) off-engine. Bit-exact:
    * no division ever happens.
    *
    * Scale shape: one map-combined per-(value) count pair, then the
    * running CDF sums computed DISTRIBUTED over the value-ordered
    * spine via [[Prefix.globalRunningSums]] (range exchange +
    * per-partition offsets — the cumulative work parallelizes across
    * all partitions; distinct values are unique, so `v` alone is the
    * required total order), one min(struct) argmax. The distinct-value
    * spine is ~n for continuous data, which this shape carries at a
    * distributed sort's cost; when sketch-grade D suffices, compare
    * KLL quantiles ([[graft.functions.QuantileSketchAgg]]) instead of
    * exact CDFs. Overflow: cum ≤ n, so nA·nB ≤ 2⁶³ needs samples
    * ≤ 3·10⁹ each. */
  def ksDistance(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val pts = a.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("ca"))
      .join(
        b.select(col(valueCol).cast("double").as("v"))
          .filter(col("v").isNotNull)
          .groupBy("v").agg(count(lit(1)).as("cb")),
        Seq("v"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val cum = Prefix.globalRunningSums(pts, order = Seq(col("v")),
      values = Seq(col("ca") -> "cumA", col("cb") -> "cumB"))
    // the final running totals ARE nA/nB — read them off the
    // checkpointed cum frame instead of re-executing the count plan
    val totals = cum.agg(max(col("cumA")).as("na"), max(col("cumB")).as("nb"))
    cum
      .join(broadcast(totals))
      .withColumn("gap", abs(col("cumA") * col("nb") - col("cumB") * col("na")))
      .agg(min(struct((-col("gap")).as("ng"), col("v").as("at_v"))).as("m"),
        first(col("na")).as("n_a"), first(col("nb")).as("n_b"))
      .select((-col("m.ng")).as("ks_num"), col("n_a"), col("n_b"),
        col("m.at_v").as("at_value"))
  }
}
