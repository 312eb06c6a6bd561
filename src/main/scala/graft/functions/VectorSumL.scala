package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<long>` rows as a `TypedImperativeAggregate`
  * — the distributed-linear-algebra accumulator: feed it a per-row
  * flattened vector/outer-product/histogram and it ships ONE array per
  * (group, partition) across the shuffle instead of exploding rows.
  * This is what makes a d×d second-moment (Gram) matrix over N rows an
  * O(d²)-state map-side combine rather than an N·d²-row explode+groupBy
  * (`posexplode` twice would shuffle 4096 rows per input row at d=64).
  *
  * Inputs must all have the same length (the first row fixes it; a
  * mismatch fails loudly — silent zip-truncation would corrupt sums).
  * Null rows and null elements are skipped (element treated as 0).
  * Arithmetic is exact i64; callers quantize doubles to fixed point
  * first (house 2^-20 convention) so sums are order-independent and
  * cross-engine reproducible. Overflow headroom: 2^63 / (max |element|)
  * rows — callers bound element magnitude, e.g. 2^40 for products of
  * 2^-20-quantized unit-range values → safe past 4×10^6 rows per group;
  * at 100 TB group cardinalities, widen the quantization instead.
  */
case class VectorSumL(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum_l expects array<bigint> input, got ${other.catalogString}")
  }

  // empty array = "no input seen yet"; the first row sizes the buffer
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buf
      case a: ArrayData =>
        val n = a.numElements()
        val acc = if (buf.length == 0) new Array[Long](n) else buf
        require(acc.length == n,
          s"vector_sum_l: input length $n != accumulator length ${acc.length}")
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i)) acc(i) += a.getLong(i)
          i += 1
        }
        acc
      case other => throw new IllegalArgumentException(
        s"vector_sum_l expects array input, got ${other.getClass}")
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else {
      require(buf.length == other.length,
        s"vector_sum_l: merge length mismatch ${buf.length} != ${other.length}")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumL =
    copy(child = newChild)

  override def prettyName: String = "vector_sum_l"
}
