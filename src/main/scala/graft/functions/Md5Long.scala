package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First `hexDigits` hex digits of md5 as a non-negative long — the
  * engine's deterministic cross-engine string hash (DuckDB twin:
  * `CAST('0x' || substr(md5(s), 1, hexDigits) AS BIGINT)`, Spark-SQL twin:
  * `conv(substr(md5(s),1,n),16,10)`).
  *
  * A dedicated codegen'd expression because the composed form
  * (md5 → hex string → substring → conv-through-decimal-string) costs ~6
  * allocations per value and gets re-evaluated once per use site when
  * Catalyst collapses projections — this is the inner loop of minhash /
  * simhash / fingerprint over every shingle of every document.
  */
case class Md5Long(child: Expression, hexDigits: Int) extends UnaryExpression {
  require(hexDigits > 0 && hexDigits <= 15, "1..15 hex digits fit a positive long")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Md5Long.hash(s.getBytes, hexDigits)
    case b: Array[Byte] => Md5Long.hash(b, hexDigits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c.getBytes(), $hexDigits)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c, $hexDigits)")
    }

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)

  override def prettyName: String = "md5_long"
}

object Md5Long {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Value of the first `hexDigits` hex chars of md5(bytes), base 16. */
  def hash(bytes: Array[Byte], hexDigits: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
