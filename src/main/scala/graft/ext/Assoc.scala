package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association statistics over (basket, item) co-occurrence — the
  * market-basket support/confidence/lift family, which in a corpus
  * pipeline is the same computation as tag/entity co-occurrence
  * weighting (which topics appear together in a document, which
  * domains co-link) feeding mixture design and graph construction.
  *
  * All outputs are integers or scaled-integer ratios (floor div), so
  * results are bit-identical across engines — lift's textbook form
  * P(ab)/(P(a)P(b)) is a float ratio of floats; here it is
  * `n_ab · n_baskets · SCALE div (n_a · n_b)` in one exact BIGINT
  * expression.
  */
object Assoc {

  val Scale = 1000000L // 1e6 fixed point for lift/confidence ratios

  /** Pairwise item association over baskets: for every unordered item
    * pair co-occurring in ≥ `minSupport` baskets, the support counts
    * and scaled lift + confidence.
    *
    * Plan shape at 100 TB: one map-combined distinct over
    * (basket, item) — presence, not multiplicity, is the semantics —
    * one map-combined item-support count, a basket-keyed SELF-JOIN
    * generating each basket's item pairs ONCE (i_a < i_b; cost
    * Σ items²/basket — bounded by the real basket width, the honest
    * price of pairwise statistics; cap basket width upstream for
    * pathological baskets), a map-combined pair count, two
    * broadcast-friendly joins against the tiny item-support table,
    * and a 1-row basket-total broadcast. Nothing global is sorted.
    *
    * Overflow: n_ab·n_baskets·Scale ≤ 2⁶³ needs n_baskets² ≤ 9·10¹²
    * (n_ab ≤ n_baskets) — fine to ~3M baskets per run; shard or drop
    * Scale beyond. */
  def itemPairStats(df: DataFrame, basket: String, item: String,
                    minSupport: Long = 1L): DataFrame = {
    val bi = df.select(col(basket).as("_b"), col(item).as("_i")).distinct()
    val support = bi.groupBy(col("_i")).agg(count(lit(1)).as("n"))
    val nBaskets = bi.select(col("_b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = bi.join(
        bi.select(col("_b"), col("_i").as("_j")), Seq("_b"))
      .filter(col("_i") < col("_j"))
      .groupBy(col("_i"), col("_j"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(support.select(col("_i"), col("n").as("n_a")), Seq("_i"))
      .join(support.select(col("_i").as("_j"), col("n").as("n_b")), Seq("_j"))
      .crossJoin(broadcast(nBaskets))
      .select(col("_i").as("item_a"), col("_j").as("item_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        expr(s"n_ab * n_baskets * ${Scale}L div (n_a * n_b)")
          .as("lift_scaled"),
        expr(s"n_ab * ${Scale}L div n_a").as("conf_a_to_b_scaled"))
  }
}
