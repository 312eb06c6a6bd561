package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch as a `TypedImperativeAggregate`: a
  * depth × width counter matrix where row i buckets a value by
  * `md5_long("i|" + value, 7) % width`. Fixed O(depth·width) memory per
  * group and an element-wise-add merge, so a 100 TB frequency profile
  * ships depth·width longs per partition where the exact `vocab_topk`
  * path shuffles every distinct token. Point estimate for a value =
  * min over rows of its counter (classic CMS upper bound: never
  * undercounts, overcounts only on collisions).
  *
  * Like [[KmvSketch]], the hash is deterministic md5 (not seeded
  * xxhash), so the ENTIRE counter matrix — not just the estimates — is
  * reproducible in any engine; the DuckDB oracle rebuilds it with the
  * same salted-md5 bucketing and exact GROUP BY counts.
  *
  * Completes the sketch family: [[KmvSketch]] (distinct), TopKRows
  * (bounded exact top-k), CmsSketch (frequency).
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth must be in 1..16, got $depth")
  require(width > 0 && width <= (1 << 20), s"width must be in 1..2^20, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects string input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => buf
      case s: UTF8String =>
        val v = s.toString
        var i = 0
        while (i < depth) {
          buf(i * width + CmsSketch.bucket(i, v, width)) += 1
          i += 1
        }
        buf
      case other => throw new IllegalArgumentException(
        s"cms_sketch expects string input, got ${other.getClass}")
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)

  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  /** Row-i bucket of a value: first 7 md5 hex digits of "i|value", mod
    * width — exactly `CAST('0x'||substr(md5(i||'|'||v),1,7) AS BIGINT) %
    * width` in DuckDB. */
  def bucket(row: Int, value: String, width: Int): Int =
    (Md5Long.hash(s"$row|$value".getBytes(StandardCharsets.UTF_8), 7) % width).toInt

  /** CMS point estimate: min counter across rows. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, value: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + bucket(i, value, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}
