package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct sliding-window-`w` minima of a long array, in first-occurrence
  * order — the winnowing selection kernel (SIGMOD 2003), as one O(n)
  * monotonic-deque pass.
  *
  * Byte-identical to the HOF formulation it replaces
  * (`array_distinct(transform(sequence(w-1, n-1), e ->
  * array_min(slice(a, e-w+2, w))))`, with `[array_min(a)]` for 0<n<w and
  * `[]` for n=0), but the HOF form COPIES a w-slice per window — O(n·w)
  * allocation per row, measured ~3 s over sf0.1's documents where this
  * kernel is ~0.1 s. CodegenFallback like [[PqEncode]]: the loop body is
  * the kernel; there is nothing for whole-stage codegen to fuse.
  * Property-tested against the HOF form on random arrays. */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins expects array<bigint> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      var m = a.getLong(0)
      var i = 1
      while (i < n) { val v = a.getLong(i); if (v < m) m = v; i += 1 }
      return new GenericArrayData(Array(m))
    }
    // monotonic deque of indices: values ascend front→back, front = window min
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    var e = 0
    while (e < n) {
      val v = a.getLong(e)
      while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = e
      tail += 1
      if (deque(head) <= e - w) head += 1
      if (e >= w - 1) {
        val m = a.getLong(deque(head))
        if (seen.add(m)) out += m
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def prettyName: String = "winnow_mins"
  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}
