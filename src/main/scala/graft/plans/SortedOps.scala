package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native membership primitives over a SORTED string array — the
  * constant-time-per-probe replacement for `array_contains` scans of a
  * broadcast hot set.
  *
  * Round 10's one perf-weak mark: the L2 boilerplate scrub filtered
  * each document's tiles with `filter(tiles, t -> !array_contains(hot,
  * t))` against a broadcast hot array that grew to ~5k tiles at 100×
  * (the relative df threshold), making the narrow pass O(tokens ·
  * hotset) — measured 67× wall at 100× data. The hot array is already
  * SORTED (built with `sort_array`, i.e. UTF8 binary order — the same
  * order [[UTF8String#compareTo]] implements), so membership is a
  * binary search: O(tokens · log hotset), with the whole
  * tiles-vs-hot-set subtraction fused into one compiled loop instead
  * of an interpreted per-element lambda.
  */
object SortedOps {

  /** Binary search `key` in ascending `arr` (UTF8 binary order).
    * Returns true iff present. */
  def contains(arr: ArrayData, key: UTF8String): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = arr.getUTF8String(mid).compareTo(key)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Elements of `items` NOT present in ascending-sorted `sorted`,
    * original order and duplicates kept — `filter(items, x ->
    * !array_contains(sorted, x))` with binary-search probes. */
  def except(items: ArrayData, sorted: ArrayData): ArrayData = {
    val n = items.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val v = items.getUTF8String(i)
      if (v == null || !contains(sorted, v)) out.add(v)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_sorted_except(items, sortedArr)` → the elements of `items`
  * absent from `sortedArr` (which MUST be ascending in UTF8 binary
  * order — build it with `sort_array`; an unsorted right side returns
  * garbage, the standard binary-search contract). */
case class SortedExcept(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_except expects (array<string>, array<string>), got $l / $r")
    }
  override def dataType: DataType = left.dataType
  override def prettyName: String = "graft_sorted_except"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedOps.except(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedOps$$.MODULE$$.except($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedExcept =
    copy(left = newLeft, right = newRight)
}
