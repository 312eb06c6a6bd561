package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Confluent Schema-Registry wire format: `0x00 | schemaId: 4-byte
  * big-endian uint32 | (proto only) message-index uvarint list | payload`.
  *
  * Semantics match the reference encoder/decoder
  * (reference: golang/util/index.go:16-36 encode;
  * golang/cmd/consumer/main.go:43-51 and golang/proto/consumer/main.go:47-90
  * decode incl. the uvarint overflow guard). The reference always writes a
  * single 0x00 message-index byte for proto (index list of length 0).
  */
object WireFormat {
  val MagicByte: Byte = 0x00

  def encode(schemaId: Int, payload: Array[Byte], proto: Boolean): Array[Byte] = {
    val headerLen = if (proto) 6 else 5
    val out = new Array[Byte](headerLen + payload.length)
    out(0) = MagicByte
    out(1) = ((schemaId >>> 24) & 0xff).toByte
    out(2) = ((schemaId >>> 16) & 0xff).toByte
    out(3) = ((schemaId >>> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    if (proto) out(5) = 0x00 // message-index list of length 0
    System.arraycopy(payload, 0, out, headerLen, payload.length)
    out
  }

  /** Unsigned varint per the reference's readUVarint
    * (golang/proto/consumer/main.go:76-90): returns (value, bytesRead);
    * bytesRead < 0 signals overflow (> 64 bits), bytesRead == 0 truncation.
    */
  def readUVarint(buf: Array[Byte], start: Int): (Long, Int) = {
    var x = 0L
    var s = 0
    var i = start
    while (i < buf.length) {
      val b = buf(i) & 0xff
      val n = i - start + 1
      if (b < 0x80) {
        // overflow guard: >64 bits. The reference checks zero-based index
        // `i > 9 || i == 9 && b > 1` (golang/proto/consumer/main.go:81),
        // i.e. a 10-byte varint is valid iff its final byte is 0 or 1.
        if (n > 10 || (n == 10 && b > 1)) return (0L, -n)
        return (x | (b.toLong << s), n)
      }
      x |= (b & 0x7fL) << s
      s += 7
      i += 1
    }
    (0L, 0)
  }

  /** Returns (schemaId, payload) or null when the frame is malformed:
    * shorter than the header, wrong magic byte, or bad uvarint (proto).
    */
  def decode(frame: Array[Byte], proto: Boolean): (Int, Array[Byte]) = {
    if (frame == null || frame.length < 5 || frame(0) != MagicByte) return null
    val schemaId =
      ((frame(1) & 0xff) << 24) | ((frame(2) & 0xff) << 16) |
        ((frame(3) & 0xff) << 8) | (frame(4) & 0xff)
    var pos = 5
    if (proto) {
      val (count, n) = readUVarint(frame, pos)
      if (n <= 0) return null
      pos += n
      var k = 0L
      while (k < count) { // skip the message-index entries themselves
        val (_, m) = readUVarint(frame, pos)
        if (m <= 0) return null
        pos += m
        k += 1
      }
    }
    if (pos > frame.length) return null
    (schemaId, java.util.Arrays.copyOfRange(frame, pos, frame.length))
  }
}

/** `wire_encode(schemaId, payload)` → binary Confluent frame. Codegen'd. */
case class WireEncode(left: Expression, right: Expression, proto: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wire_encode requires (int, binary), got $other")
    }

  override def nullSafeEval(id: Any, payload: Any): Any =
    WireFormat.encode(id.asInstanceOf[Int], payload.asInstanceOf[Array[Byte]], proto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WireFormat.encode($a, $b, $proto)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WireEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "wire_encode"
}

/** `wire_decode(frame)` → struct<schema_id:int, payload:binary>, null on a
  * malformed frame (the reference's guard behavior, A13). Not in any bench
  * hot path, so interpreted eval (CodegenFallback) is acceptable here.
  */
case class WireDecode(child: Expression, proto: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("schema_id", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val decoded = WireFormat.decode(input.asInstanceOf[Array[Byte]], proto)
    if (decoded == null) null
    else InternalRow(decoded._1, decoded._2)
  }

  override protected def withNewChildInternal(newChild: Expression): WireDecode =
    copy(child = newChild)

  override def prettyName: String = "wire_decode"
}
