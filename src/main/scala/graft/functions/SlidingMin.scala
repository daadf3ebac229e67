package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sliding-window minimum over an array<long> — every window
  * of `w` consecutive elements contributes its minimum; an input
  * shorter than one window yields the single minimum of what exists
  * (never an empty output for a non-empty input).
  *
  * This is the O(n) monotonic-deque algorithm. The higher-order-
  * function formulation (`transform(indices, i -> array_min(slice(a,
  * i+1, w)))`) is O(n·w) with a fresh array COPY per window and two
  * interpreted lambdas — measured 99 s for the winnowing fingerprint
  * pass at sf0.1 where this expression runs it in under a second.
  * Codegen emits one static call, keeping the surrounding projection
  * inside whole-stage codegen; the interpreted eval shares the same
  * helper, so both paths are identical.
  */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_min expects array<bigint>, got ${t.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    SlidingMin.slidingMin(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SlidingMin.slidingMin($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SlidingMin {

  /** Shared by interpreted eval and generated code. Empty in → empty
    * out; n < w → one window over the whole array. NULL elements
    * (the declared element type may be nullable even when values
    * never are) are treated as +∞ — they never win a window, and a
    * window of only NULLs yields Long.MaxValue — so the pass is
    * total instead of NPEing on a null entry. */
  def slidingMin(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    def at(i: Int): Long =
      if (arr.isNullAt(i)) Long.MaxValue else arr.getLong(i)
    val out = new Array[Long](math.max(n - w, 0) + 1)
    val deque = new Array[Int](n) // indices, values increasing
    var head = 0
    var tail = 0 // live range [head, tail)
    var i = 0
    while (i < n) {
      val v = at(i)
      while (tail > head && at(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = at(deque(head))
      i += 1
    }
    if (n < w) out(0) = at(deque(head))
    new GenericArrayData(out)
  }
}
