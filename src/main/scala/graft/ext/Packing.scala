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
}
