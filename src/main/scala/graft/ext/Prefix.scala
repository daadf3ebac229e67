package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed global prefix sums (running totals over a TOTAL order).
  *
  * `sum(v).over(Window.orderBy(...))` with no partition key plans a
  * single-partition WindowExec — every row moves to one task, the
  * classic global-cumsum scale cliff. This operator computes the same
  * running totals with the two-phase scheme a cluster wants:
  *
  *   1. range-repartition on the order key, sort within partitions;
  *   2. pin that physical layout with an eager `localCheckpoint()` —
  *      a range exchange RE-SAMPLES its boundaries on every plan
  *      execution, so without pinning, a second job over the same
  *      frame may see DIFFERENT partition boundaries and the offsets
  *      below would be silently wrong;
  *   3. one tiny driver job collects per-partition value sums
  *      (#partitions rows — the `RDD.zipWithIndex` pattern) and turns
  *      them into per-partition starting offsets;
  *   4. the running total is then offset + an intra-partition window
  *      sum, which parallelizes across all partitions.
  *
  * Requirements: `order` must be a total order (include a unique
  * tiebreaker column) — rows that compare equal could otherwise land
  * on either side of a partition boundary and take different offsets.
  * Values are summed as `long`.
  *
  * The checkpoint materializes the input once and truncates lineage;
  * blocks are dropped when the frame is garbage-collected. Trade-off
  * vs a plain cache: re-executions can never drift, but executor loss
  * loses blocks (acceptable for the batch jobs this serves; use
  * reliable checkpointing on a cluster where that matters).
  */
object Prefix {

  /** Adds one running-total column per `(value, name)` pair, computed
    * over the global `order`. Returns rows range-partitioned and
    * sorted by `order` (a useful layout for the downstream cut that
    * usually follows a global cumsum). */
  def globalRunningSums(df: DataFrame, order: Seq[Column],
                        values: Seq[(Column, String)],
                        partitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "need at least one (value, name) pair")
    val valCols = values.zipWithIndex.map { case ((v, _), i) =>
      v.cast("long").as(s"_gv$i")
    }
    val projected = df.select(col("*") +: valCols: _*)
    // partitions = 0 → spark.sql.shuffle.partitions, and AQE is free to
    // right-size the exchange; an explicit count pins the fan-out
    val ranged0 =
      if (partitions > 0) projected.repartitionByRange(partitions, order: _*)
      else projected.repartitionByRange(order: _*)
    val ranged = ranged0
      .sortWithinPartitions(order: _*)
      .withColumn("_gp", spark_partition_id())
      .localCheckpoint()
    // tiny job: per-partition sums → per-partition starting offsets
    val aggCols = values.indices.map(i => sum(col(s"_gv$i")).as(s"_s$i"))
    val sums = ranged.groupBy("_gp")
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        values.indices.map(i => if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      .sortBy(_._1)
    val acc = Array.fill(values.size)(0L)
    val offsets: Map[Int, Seq[Long]] = sums.map { case (p, ss) =>
      val off = acc.toSeq
      ss.zipWithIndex.foreach { case (s, i) => acc(i) += s }
      p -> off
    }.toMap
    val w = Window.partitionBy("_gp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = values.zipWithIndex.foldLeft(ranged) {
      case (acc0, ((_, name), i)) =>
        val offMap = typedLit(offsets.map { case (p, os) => p -> os(i) })
        acc0.withColumn(name,
          element_at(offMap, col("_gp")) + sum(col(s"_gv$i")).over(w))
    }
    out.drop("_gp" +: values.indices.map(i => s"_gv$i"): _*)
  }

  /** Single-value convenience form. */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                       cumName: String, partitions: Int = 0): DataFrame =
    globalRunningSums(df, order, Seq(value -> cumName), partitions)

  /** Stable dense row ids 0..n−1 over a TOTAL `order` — the corpus
    * primitive behind contiguous doc ids, shard-stable training
    * indices, and array-backed serving layouts. zipWithIndex on the
    * RDD gives the same thing but pins a physical partitioning and
    * drops out of the Dataset optimizer; `row_number() OVER (ORDER
    * BY …)` is the single-reducer cliff. This is just a running count
    * through the two-phase scheme: range exchange + per-partition
    * offsets, fully parallel, deterministic for a total order. */
  def denseIds(df: DataFrame, order: Seq[Column], name: String,
               partitions: Int = 0): DataFrame =
    globalRunningSum(df, order, lit(1L), name, partitions)
      .withColumn(name, col(name) - 1L)

  /** EXCLUSIVE running max over a total `order`: for each row,
    * max(`value`) over all strictly-preceding rows — null for the
    * global first row. The Pareto-frontier / envelope primitive
    * (`gain > running max of cheaper gains` ⇔ on the frontier), with
    * the same two-phase distributed scheme as [[globalRunningSums]]:
    * range exchange pinned by checkpoint, per-partition maxes folded
    * into per-partition STARTING maxes on the driver (#partitions
    * rows), then a partitioned intra-partition window. The value's
    * native type is preserved (no long cast — a decimal envelope
    * stays exact); the driver fold compares via Comparable, which
    * every orderable Spark external type implements. */
  def globalRunningMaxExclusive(df: DataFrame, order: Seq[Column],
                                value: Column, name: String,
                                partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val projected = df.select(col("*"), value.as("_gv"))
    val ranged0 =
      if (partitions > 0) projected.repartitionByRange(partitions, order: _*)
      else projected.repartitionByRange(order: _*)
    val ranged = ranged0
      .sortWithinPartitions(order: _*)
      .withColumn("_gp", spark_partition_id())
      .localCheckpoint()
    val spark = ranged.sparkSession
    val vType = ranged.schema("_gv").dataType
    val perPart = ranged.groupBy("_gp").agg(max(col("_gv")).as("_m"))
      .collect().sortBy(_.getInt(0))
    var acc: Any = null
    val offRows = perPart.map { r =>
      val off = acc
      if (!r.isNullAt(1)) {
        val m = r.get(1)
        acc =
          if (acc == null) m
          else if (acc.asInstanceOf[Comparable[Any]].compareTo(m) >= 0) acc
          else m
      }
      org.apache.spark.sql.Row(r.getInt(0), off)
    }
    val offDf = spark.createDataFrame(offRows.toSeq.asJava,
      StructType(Seq(StructField("_gp", IntegerType, nullable = false),
        StructField("_off", vType))))
    val w = Window.partitionBy("_gp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "_gp")
      // greatest skips nulls: first row of a partition sees only the
      // carried-in offset; first partition's offset is null ⇒ null
      .withColumn(name, greatest(col("_off"), max(col("_gv")).over(w)))
      .drop("_gp", "_gv", "_off")
  }
}
