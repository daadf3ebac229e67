package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Table access + numeric conventions shared by every query.
  *
  * Numeric convention for oracle parity (driver hash-compares against
  * DuckDB): sums over `double` columns are order-dependent in IEEE754,
  * so every SUM is computed over an exact DECIMAL(18,2) cast and the
  * final value is cast back to DOUBLE. Decimal arithmetic is exact in
  * both engines, and a given exact decimal maps to the same nearest
  * double everywhere, so results are bit-identical regardless of
  * partitioning / parallelism.
  */
object tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize `events.ts` to a true TimestampType regardless of how
    // the file spells it: TIMESTAMP(NANOS) arrives as nanos-since-
    // epoch LongType (spark.sql.legacy.parquet.nanosAsLong), and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    // TIMESTAMP_NTZ — which watermarks and unix_timestamp() reject.
    // The session runs in UTC, so the NTZ cast is an identity relabel.
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", df("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Exact-money view of a double column (2-dp business data). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-dp double column, surfaced as double. */
  def dsum(c: Column): Column =
    org.apache.spark.sql.functions.sum(dec(c)).cast("double")

  /** Timestamp outputs are emitted as TIMESTAMP_NTZ so the written
    * parquet carries isAdjustedToUTC=false, matching DuckDB's naive
    * TIMESTAMP (the session runs in UTC, so the cast is an identity
    * relabeling, not a conversion). */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")
}
