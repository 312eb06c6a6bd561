package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a `TypedImperativeAggregate`: keeps the k
  * struct rows SMALLEST in the struct's natural ascending field order
  * (encode "top by value DESC, id ASC" as `struct(-value, id)`), emitted
  * as a sorted array.
  *
  * Why this exists: Spark's idiomatic per-group top-k —
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` —
  * shuffles EVERY input row to the window sort before any can be
  * discarded. This aggregate is associative, so it partial-aggregates
  * map-side like any built-in: the shuffle ships at most k rows per
  * (group, input partition) and memory is O(k) per group. At 100 TB
  * with bounded k that is the difference between shuffling the table
  * and shuffling a rounding error of it.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, s"k must be in 1..65536, got $k")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_rows expects an orderable struct input, got ${other.catalogString}")
  }

  @transient private lazy val elemTypes: Seq[DataType] =
    child.dataType.asInstanceOf[StructType].fields.toSeq.map(_.dataType)
  @transient private lazy val ord = RowOrdering.createNaturalAscendingOrdering(elemTypes)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  /** Sorted-ascending bounded insert (binary search; buffer rows are
    * owned copies — aggregate input rows are reused by the framework). */
  private def insert(buf: ArrayBuffer[InternalRow], row: InternalRow): Unit = {
    if (buf.length < k || ord.compare(row, buf.last) < 0) {
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(row, buf(mid)) < 0) hi = mid else lo = mid + 1
      }
      buf.insert(lo, row.copy())
      if (buf.length > k) buf.remove(buf.length - 1)
    }
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    child.eval(input) match {
      case null => buf
      case row: InternalRow => insert(buf, row); buf
    }
  }

  override def merge(buf: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(elemTypes.toArray)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { r =>
      val bytes = proj(r).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(elemTypes.length)
      row.pointTo(b, len) // row owns its private byte array
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)

  override def prettyName: String = "top_k_rows"
}
