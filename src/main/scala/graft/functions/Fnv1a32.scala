package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash over the UTF-8 bytes of a string (or raw binary).
  *
  * Replicates the reference's custom Kafka partitioner hash
  * (reference: golang/chapter_4/sales/custom_order_partitioner.go:26-31):
  * `h = 2166136261; for each byte: h ^= b; h *= 16777619 (mod 2^32)`.
  *
  * Result is the unsigned 32-bit value widened to Long (0 .. 2^32-1) so the
  * `% numPartitions` step needs no sign fix-up. Implemented as a native
  * Catalyst expression with `doGenCode` so it stays inside whole-stage
  * codegen (a Scala UDF here would break the codegen pipeline on what is,
  * in the reference, the per-record hot path).
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv1a32 requires string or binary input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Fnv1a32.hash(s.getBytes)
    case b: Array[Byte] => Fnv1a32.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32.hash($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32.hash($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)

  override def prettyName: String = "fnv1a32"
}

object Fnv1a32 {
  /** Shared by interpreted eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 2166136261L
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xffL)) * 16777619L) & 0xffffffffL
      i += 1
    }
    h
  }
}
