package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Two-dimensional Z-order (Morton) key: interleaves the low 32 bits of
  * two non-negative long keys, x in the even bit positions and y in the
  * odd ones. Rows close on BOTH dimensions get close z-values, so a
  * range-partition + sort on z clusters a table for min/max pruning on
  * either key — the multi-dimensional layout trick behind z-ordered table
  * formats. Bit spreading uses the classic constant-time magic-number
  * sequence (public-domain "Interleave bits by Binary Magic Numbers");
  * codegen'd so layout writes stay inside whole-stage codegen.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_order2 requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder2.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_order2"
}

object ZOrder2 {
  /** Spread the low 32 bits of v one apart: bit i → bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x bits at even positions, y bits at odd positions.
    * Inputs outside [0, 2^32) raise — silently masking them (the previous
    * behavior) would alias unrelated keys onto the same z-value and quietly
    * destroy clustering/pruning for wide key domains. Callers with wider
    * domains must pre-normalize (rank or hash to 32 bits) first. */
  def interleave(x: Long, y: Long): Long = {
    if (((x | y) & 0xFFFFFFFF00000000L) != 0L)
      throw new IllegalArgumentException(
        s"z_order2 inputs must be in [0, 2^32): got ($x, $y); " +
          "rank or hash wider keys to 32 bits before interleaving")
    spread(x) | (spread(y) << 1)
  }
}
