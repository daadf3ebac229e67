package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Context-window packing for LLM pretraining: documents are laid out
  * in a deterministic order, token counts accumulate, and each
  * document is assigned to the fixed-budget context bin its START
  * offset falls in — concat-and-chunk packing (documents may straddle
  * a bin boundary; training loss masks handle the overflow). The
  * assignment is a closed-form window expression, so it is exactly
  * reproducible by any engine (oracle x20) — unlike greedy
  * first-fit packing, which is sequential state.
  *
  * Scale posture: the running sum is one window per group. To bound
  * any single window partition at corpus scale, include a shard
  * column in `groupCols` (e.g. `pmod(xxhash64(id), nShards)`) —
  * packing quality is unaffected because bins never span groups, and
  * the window then parallelizes across `groups × shards`.
  */
object Packing {

  /** Adds `n_tokens` (the evaluated `tokens` expression), `bin` (the
    * context index within the group) and `bin_offset` (the document's
    * token start offset inside its bin). `orderCol` must be a TOTAL
    * order within each group (unique per row) — ties would make the
    * running offsets, and thus bin assignment, engine-arbitrary. */
  def packByBudget(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("_start") / budget))
      .withColumn("bin_offset", col("_start") - col("bin") * budget)
      .drop("_start")
  }

  /** Packing-efficiency report over [[packByBudget]] output: bins
    * used, fill rate, and boundary-straddling documents per group —
    * the "how much does this budget waste" number that decides
    * context length and truncation policy before a training run.
    * `n_bins` counts laid-out contexts (max bin + 1; the tail bin is
    * partially filled), `capacity` = n_bins · budget, and a STRADDLER
    * starts in one bin and ends past its boundary
    * (bin_offset + n_tokens > budget) — the documents whose loss
    * masks cross contexts. `fill_ppm` can exceed 10⁶ when the final
    * document overruns the last bin's boundary (bins are assigned by
    * START offset — [[packByBudget]]'s concat-and-chunk contract).
    * One map-combined aggregation per group. */
  def packingEfficiency(packed: DataFrame, groupCols: Seq[String],
                        budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    packed.groupBy(groupCols.map(col): _*)
      .agg((max(col("bin")) + 1L).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("bin_offset") + col("n_tokens") > budget, 1L)
          .otherwise(0L)).as("n_straddlers"))
      .withColumn("capacity", col("n_bins") * budget)
      .withColumn("fill_ppm",
        IntMath.ppmDiv(col("total_tokens"), col("capacity")))
  }

  /** Serpentine (boustrophedon) balanced shard assignment: documents
    * sorted by token count DESCENDING (id tiebreak — a total order)
    * are dealt across `nShards` shards in alternating direction
    * (pass 0: 0,1,…,S−1; pass 1: S−1,…,1,0; …), the classic
    * load-balancing layout for training shards of unequal documents
    * ("make every shard's token count as equal as possible so no
    * data-parallel worker stalls"). Unlike [[graft.ext.Sampling.rendezvousShard]]
    * (hash placement — stable under corpus growth, but token-blind),
    * this balances LOAD: with sorted items the serpentine deal keeps
    * max−min shard load ≤ the largest single document's tokens
    * (property-tested), close to LPT's bound without LPT's inherently
    * sequential running-minimum state — the assignment is a pure
    * closed form of the global rank, so any engine reproduces it
    * (oracle x199).
    *
    * Scale shape: the global rank is [[Prefix.denseIds]] — a range
    * exchange + per-partition offsets, NEVER a single-reducer window
    * (the suite-wide plan gate). Everything after it is per-row
    * integer arithmetic. NULL/negative token counts clamp to 0 (sort
    * last, weigh nothing). Returns the input columns +
    * (n_tokens, shard). */
  def balancedShards(df: DataFrame, id: String, tokens: Column,
                     nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val base = df.withColumn("n_tokens",
      greatest(lit(0L), coalesce(tokens.cast("long"), lit(0L))))
    val ranked = graft.ext.Prefix.denseIds(base,
      Seq(col("n_tokens").desc, col(id)), "_rn")
    ranked
      .withColumn("_pass", IntMath.truncDiv(col("_rn"), lit(nShards.toLong)))
      .withColumn("_pos", pmod(col("_rn"), lit(nShards.toLong)))
      .withColumn("shard", when(pmod(col("_pass"), lit(2L)) === 0, col("_pos"))
        .otherwise(lit(nShards.toLong - 1) - col("_pos")))
      .drop("_rn", "_pass", "_pos")
  }
}
