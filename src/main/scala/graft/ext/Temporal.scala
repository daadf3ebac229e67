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
}
