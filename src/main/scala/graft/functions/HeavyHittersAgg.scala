package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a native
  * mergeable aggregate — approximate frequent-item counts in a
  * fixed-size summary.
  *
  * Exact hot-token / hot-key discovery (`GROUP BY item`) shuffles the
  * full item stream; at 100 TB the vocabulary doesn't fit anywhere.
  * SpaceSaving keeps at most `cap` (item → count, error) slots per
  * partial: a seen item increments its slot; an unseen item beyond
  * capacity EVICTS the minimum-count slot, inheriting its count as
  * both estimate floor and recorded error. Guarantees (n = stream
  * length): true ≤ est ≤ true + err, err ≤ n/cap, and every item with
  * frequency > n/cap is present in the summary. Partials merge by
  * summing counts/errors item-wise and truncating back to the `cap`
  * largest — the mergeable-summaries combine (Agarwal et al. 2012)
  * that preserves those guarantees, so the shuffle carries ≤ cap
  * entries per map task, never the item stream.
  *
  * When `cap` ≥ the number of distinct items, no eviction ever
  * happens: counts are EXACT, errors zero, and the result is
  * deterministic under any partitioning — the x58 oracle pins that
  * regime against a plain GROUP BY. Beyond it, estimates depend on
  * arrival order (inherent to every frequent-items sketch); specs pin
  * the published bounds instead of exact values.
  *
  * Output: array of (item, est, err) structs, (est desc, item asc) —
  * a total order, so the exact regime is bit-deterministic.
  */
case class HeavyHittersAgg(
    itemExpr: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]]
  with ImplicitCastInputTypes {

  require(cap >= 1, s"graft_heavyhitters needs cap >= 1, got $cap")

  type Buf = mutable.LinkedHashMap[String, (Long, Long)]

  override def children: Seq[Expression] = Seq(itemExpr)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Buf = mutable.LinkedHashMap.empty

  private def offer(buf: Buf, item: String, cnt: Long, err: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + cnt, e + err))
      case None if buf.size < cap => buf.update(item, (cnt, err))
      case None =>
        // evict the minimum-estimate slot; ties broken by item string
        // so eviction is a deterministic function of the buffer state
        val (mi, (mc, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(mi)
        buf.update(item, (mc + cnt, mc + err))
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = itemExpr.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // item-wise sum, then truncate to the cap largest (est desc, item
    // asc) — the mergeable-summaries combine
    other.foreach { case (item, (c, e)) =>
      buf.get(item) match {
        case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
        case None => buf.update(item, (c, e))
      }
    }
    if (buf.size <= cap) buf
    else {
      val kept = buf.toSeq.sortBy { case (item, (c, _)) => (-c, item) }.take(cap)
      val out = createAggregationBuffer()
      kept.foreach { case (item, ce) => out.update(item, ce) }
      out
    }
  }

  override def eval(buf: Buf): Any = {
    val order = buf.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
    new GenericArrayData(order.map { case (item, (c, e)) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (c, e)) =>
      out.writeUTF(item); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (1 to n).foreach { _ =>
      val item = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.update(item, (c, e))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "graft_heavyhitters"
}

object HeavyHittersAgg {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavyhitters",
      exprs => HeavyHittersAgg(exprs(0),
        exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other =>
            sys.error(s"graft_heavyhitters cap must be an int literal, got $other")
        }).toAggregateExpression(),
      "built-in")

  /** The (item, est, err) summary of a group, hottest first. */
  def heavyHitters(item: Column, cap: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_heavyhitters",
      item.cast("string"), org.apache.spark.sql.functions.lit(cap))
}
