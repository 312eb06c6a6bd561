package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Two-dimensional Hilbert-curve key over a 2^16 × 2^16 grid: maps
  * (x, y) to the cell's distance along the order-16 Hilbert curve.
  * Like [[ZOrder2]] this makes rows close on BOTH dimensions close in
  * the one sort key, but the Hilbert walk never jumps (consecutive d
  * are always Manhattan-adjacent cells, which Z-order's bit-interleave
  * violates at every power-of-two boundary), so range partitions on h
  * cut strictly tighter bounding boxes — the layout key Delta/Iceberg
  * offer as the premium alternative to Z-order for multi-dimensional
  * min/max pruning at 100 TB. Iterative bit algorithm (public-domain,
  * the classic xy2d loop: per scale bit, add the quadrant's curve
  * offset, then reflect/transpose the frame); 16 constant-time rounds,
  * codegen'd so layout writes stay inside whole-stage codegen.
  */
case class Hilbert2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert2 requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert2.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Hilbert2.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert2"
}

object Hilbert2 {
  /** Axis bits: 16 per dimension → h in [0, 2^32). */
  val Order = 16
  /** Grid side = 2^Order. */
  val N: Int = 1 << Order

  /** Hilbert distance of cell (x, y) on the N×N grid. Inputs outside
    * [0, 2^16) raise — silently masking would alias unrelated keys and
    * quietly destroy the clustering (same contract as [[ZOrder2]]);
    * callers with wider domains pre-normalize (rank, hash, or pmod).
    *
    * Per scale bit s (high → low): the quadrant index ((3·rx) xor ry)
    * is the quadrant's position ALONG the curve, contributing s² cells;
    * the frame then reflects (rx=1, ry=0: x,y → N-1-·) and transposes
    * (ry=0: swap) so the next bit is read in curve-local orientation.
    * Reflecting within the full grid (N-1-·) rather than the current
    * scale is safe: bits ≥ s are never examined again, and the low
    * bits complement identically. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    if (((xIn | yIn) & ~0xFFFFL) != 0L)
      throw new IllegalArgumentException(
        s"hilbert2 inputs must be in [0, 2^16): got ($xIn, $yIn); " +
          "rank, hash, or pmod wider keys to 16 bits first")
    var x = xIn.toInt
    var y = yIn.toInt
    var d = 0L
    var s = N >>> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1 else 0
      val ry = if ((y & s) != 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = N - 1 - x
          y = N - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }

  /** Inverse (d → (x, y)) — used by the spec to pin the walk's
    * never-jumps property and the xy2d/d2xy round trip; not an
    * Expression (layout writes only ever need the forward key). */
  def d2xy(dIn: Long): (Int, Int) = {
    require(dIn >= 0L && dIn < (1L << (2 * Order)), s"d out of range: $dIn")
    var x = 0
    var y = 0
    var t = dIn
    var s = 1
    while (s < N) {
      val rx = (1L & (t / 2)).toInt
      val ry = (1L & (t ^ rx)).toInt
      // inverse rotate at scale s (forward used the full grid; on the
      // way UP only bits < s are populated, so s-1-· is the exact inverse)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
