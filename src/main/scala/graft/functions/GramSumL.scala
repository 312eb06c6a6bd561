package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused second-moment (Gram) accumulator: Σ over rows of the d×d outer
  * product x·xᵀ of an `array<long>` vector, computed INSIDE the aggregate
  * update — no per-row d² intermediate array is ever allocated (the HOF
  * form `vector_sum_l(flatten(transform(xs, a -> transform(xs, b -> a*b))))`
  * builds and garbage-collects a 4096-element array per input row at
  * d=64; this expression reads the d inputs once and multiply-adds into
  * the buffer, the same 11×-class win as `PqEncode` over its Column-tree
  * predecessor).
  *
  * State is the UPPER TRIANGLE only — d(d+1)/2 longs per (group,
  * partition), symmetric entries mirrored once per group at eval time, so
  * the emitted value is the familiar row-major d×d array and downstream
  * index math (`idx div d`, `idx mod d`) is unchanged. Arithmetic is
  * exact i64 on caller-quantized fixed-point inputs (house 2^-20
  * convention) — order-independent, cross-engine reproducible, identical
  * sums to the unfused form. Overflow headroom matches `vector_sum_l`:
  * elements bounded by 2^40 leave room for 4×10^6 rows per group; widen
  * the quantization at larger group cardinalities.
  *
  * Null rows are skipped; a null ELEMENT poisons nothing because callers
  * quantize with floor() over non-null embeddings — but a null element or
  * a length ≠ d fails loudly rather than corrupting the matrix.
  */
case class GramSumL(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private def triLen: Int = d * (d + 1) / 2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if d > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"gram_sum_l dimension must be positive, got $d")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_sum_l expects array<bigint> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](triLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buf
      case a: ArrayData =>
        require(a.numElements() == d,
          s"gram_sum_l: input length ${a.numElements()} != dimension $d")
        val x = new Array[Long](d)
        var i = 0
        while (i < d) {
          require(!a.isNullAt(i), s"gram_sum_l: null element at $i")
          x(i) = a.getLong(i)
          i += 1
        }
        var k = 0
        i = 0
        while (i < d) {
          val xi = x(i)
          var j = i
          while (j < d) { buf(k) += xi * x(j); k += 1; j += 1 }
          i += 1
        }
        buf
      case other => throw new IllegalArgumentException(
        s"gram_sum_l expects array input, got ${other.getClass}")
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  // mirror the triangle into the full row-major d×d matrix, once per group
  override def eval(buf: Array[Long]): Any = {
    val full = new Array[Long](d * d)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = buf(k)
        full(i * d + j) = v
        full(j * d + i) = v
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(full)
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSumL =
    copy(child = newChild)

  override def prettyName: String = "gram_sum_l"
}
