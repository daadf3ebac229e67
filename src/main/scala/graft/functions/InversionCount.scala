package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native inversion count over an array<long>: the number of index
  * pairs i < j with a(i) > a(j), counted by a bottom-up merge sort in
  * O(n log n) — the classical reduction that turns Mann–Kendall's
  * S-statistic from a pairwise O(n²) self-join into a single pass
  * over the per-key time-ordered series (S = n_pairs − ties − 2·inv;
  * see [[graft.ext.Temporal.mannKendall]]).
  *
  * NULL elements are skipped entirely — they participate in no
  * inversion (the caller accounts for null-involving pairs
  * separately, as comparisons that yield 0). Empty / all-null input
  * counts 0. The count is exact in Long (an n of 2^32 would be needed
  * to overflow — far beyond any per-key time span).
  *
  * Codegen emits one static call so the surrounding projection stays
  * inside whole-stage codegen; the interpreted eval shares the same
  * helper.
  */
case class InversionCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"inversions expects array<bigint>, got ${t.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    InversionCount.inversions(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.InversionCount.inversions($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object InversionCount {

  /** Shared by interpreted eval and generated code: non-null elements
    * are compacted in order, then merge-sorted counting, for each
    * merge step that takes from the right run, how many left-run
    * elements it jumped (strict >, so equal values never count). */
  def inversions(arr: ArrayData): Long = {
    val n0 = arr.numElements()
    var n = 0
    val a = new Array[Long](n0)
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { a(n) = arr.getLong(i); n += 1 }
      i += 1
    }
    if (n < 2) return 0L
    val buf = new Array[Long](n)
    var count = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        // merge a[lo,mid) and a[mid,hi) into buf[lo,hi)
        var l = lo; var r = mid; var o = lo
        while (l < mid && r < hi) {
          if (a(l) <= a(r)) { buf(o) = a(l); l += 1 }
          else { buf(o) = a(r); r += 1; count += (mid - l) }
          o += 1
        }
        while (l < mid) { buf(o) = a(l); l += 1; o += 1 }
        while (r < hi) { buf(o) = a(r); r += 1; o += 1 }
        System.arraycopy(buf, lo, a, lo, hi - lo)
        lo += 2 * width
      }
      width *= 2
    }
    count
  }
}
