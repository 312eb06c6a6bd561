package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-driven Avro binary codec with reader/writer schema RESOLUTION —
  * the second half of the reference's Avro surface
  * (golang/avro/avenger_avro.go:41-62 `DeserializeAvengerAvroFromSchema`
  * compiles writer-schema bytes against the reader schema; versioned
  * registry lookups in commands.sh:37-39). Semantics follow the public
  * Avro 1.12 specification's Schema Resolution rules:
  *
  *  - record fields match by NAME, not position; writer-only fields are
  *    skip-decoded, reader-only fields take their declared default
  *    (e.g. the reference's `movies` default `[]`, golang/avenger.avsc:9-14)
  *    and it is a plan-time error if such a field has none;
  *  - numeric promotions int→long/float/double, long→float/double,
  *    float→double, and string↔bytes;
  *  - writer unions resolve per-datum by branch index; reader unions accept
  *    the first resolvable branch.
  *
  * Supported types: null, boolean, int, long, float, double, bytes, string,
  * array, map, union, record (nested). Not supported: enum and fixed
  * (absent from the reference surface) — rejected at parse time.
  *
  * Serde demo path, not a bench hot path → interpreted eval
  * (CodegenFallback), same as [[RecordCodecs]]. Schemas are constant
  * strings: parsing + static resolution validation happen once at plan
  * time, never per row.
  */
object AvroSchemaCodec {

  sealed trait AvroType
  case object ANull extends AvroType { override def toString = "null" }
  case object ABoolean extends AvroType { override def toString = "boolean" }
  case object AInt extends AvroType { override def toString = "int" }
  case object ALong extends AvroType { override def toString = "long" }
  case object AFloat extends AvroType { override def toString = "float" }
  case object ADouble extends AvroType { override def toString = "double" }
  case object ABytes extends AvroType { override def toString = "bytes" }
  case object AString extends AvroType { override def toString = "string" }
  final case class AArray(items: AvroType) extends AvroType
  final case class AMap(values: AvroType) extends AvroType
  final case class AUnion(branches: Seq[AvroType]) extends AvroType
  final case class AField(name: String, tpe: AvroType, default: Option[JsonNode])
  final case class ARecord(name: String, fields: Seq[AField]) extends AvroType

  // ---- schema JSON parsing ----

  private val mapper = new ObjectMapper

  def parse(json: String): AvroType =
    parseNode(mapper.readTree(json), mutable.Map.empty)

  private def parseNode(n: JsonNode, named: mutable.Map[String, AvroType]): AvroType =
    if (n.isTextual) primitiveOrRef(n.asText, named)
    else if (n.isArray) AUnion(n.elements().asScala.map(parseNode(_, named)).toSeq)
    else if (n.isObject) {
      val t = n.get("type").asText
      t match {
        case "array" => AArray(parseNode(n.get("items"), named))
        case "map" => AMap(parseNode(n.get("values"), named))
        case "record" =>
          val ns = Option(n.get("namespace")).map(_.asText)
          val name = n.get("name").asText
          val fullName = ns.filter(_ => !name.contains(".")).map(_ + "." + name).getOrElse(name)
          val fields = n.get("fields").elements().asScala.map { f =>
            AField(f.get("name").asText, parseNode(f.get("type"), named),
              Option(f.get("default")))
          }.toSeq
          val rec = ARecord(fullName, fields)
          named(fullName) = rec
          rec
        case "enum" | "fixed" =>
          throw new IllegalArgumentException(s"unsupported Avro type: $t")
        case prim => primitiveOrRef(prim, named)
      }
    } else throw new IllegalArgumentException(s"bad Avro schema node: $n")

  private def primitiveOrRef(s: String, named: mutable.Map[String, AvroType]): AvroType =
    s match {
      case "null" => ANull
      case "boolean" => ABoolean
      case "int" => AInt
      case "long" => ALong
      case "float" => AFloat
      case "double" => ADouble
      case "bytes" => ABytes
      case "string" => AString
      case ref => named.getOrElse(ref, throw new IllegalArgumentException(
        s"unsupported or unknown Avro type reference: $ref"))
    }

  // ---- Spark type mapping ----

  private def isNullable(t: AvroType): Boolean = t match {
    case ANull => true
    case AUnion(bs) => bs.contains(ANull)
    case _ => false
  }

  private def nonNullOf(t: AvroType): AvroType = t match {
    case AUnion(bs) => bs.filter(_ != ANull) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"only unions of null with one type map to Spark, got union of $other")
    }
    case other => other
  }

  def sparkType(t: AvroType): DataType = nonNullOf(t) match {
    case ANull => NullType
    case ABoolean => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case ABytes => BinaryType
    case AString => StringType
    case AArray(it) => ArrayType(sparkType(it), containsNull = isNullable(it))
    case AMap(v) => MapType(StringType, sparkType(v), valueContainsNull = isNullable(v))
    case ARecord(_, fs) => StructType(fs.map(f =>
      StructField(f.name, sparkType(f.tpe), nullable = isNullable(f.tpe))))
    case u: AUnion => throw new IllegalStateException(s"unreachable: $u")
  }

  // ---- static resolution validation (plan-time) ----

  private def promotable(w: AvroType, r: AvroType): Boolean = (w, r) match {
    case (a, b) if a == b => true
    case (AInt, ALong | AFloat | ADouble) => true
    case (ALong, AFloat | ADouble) => true
    case (AFloat, ADouble) => true
    case (AString, ABytes) | (ABytes, AString) => true
    case _ => false
  }

  private def canResolve(w: AvroType, r: AvroType): Boolean =
    try { validateResolution(w, r); true }
    catch { case _: IllegalArgumentException => false }

  /** Throws IllegalArgumentException describing the first incompatibility. */
  def validateResolution(w: AvroType, r: AvroType): Unit = (w, r) match {
    case (ARecord(_, wf), ARecord(_, rf)) =>
      val wByName = wf.map(f => f.name -> f).toMap
      rf.foreach { f =>
        wByName.get(f.name) match {
          case Some(wfld) => validateResolution(wfld.tpe, f.tpe)
          case None => if (f.default.isEmpty) throw new IllegalArgumentException(
            s"reader field '${f.name}' is absent from the writer schema and has no default")
        }
      }
    case (AArray(wi), AArray(ri)) => validateResolution(wi, ri)
    case (AMap(wv), AMap(rv)) => validateResolution(wv, rv)
    case (AUnion(wbs), _) => wbs.foreach(b => validateResolution(b, r))
    case (_, AUnion(rbs)) =>
      if (!rbs.exists(b => canResolve(w, b))) throw new IllegalArgumentException(
        s"no reader union branch of $r accepts writer type $w")
    case (a, b) =>
      if (!promotable(a, b)) throw new IllegalArgumentException(
        s"cannot resolve writer type $a against reader type $b")
  }

  // ---- defaults (reader-side JSON → Catalyst values) ----

  def defaultValue(t: AvroType, node: JsonNode): Any = t match {
    case ANull => null
    case ABoolean => node.asBoolean
    case AInt => node.asInt
    case ALong => node.asLong
    case AFloat => node.floatValue
    case ADouble => node.doubleValue
    case AString => UTF8String.fromString(node.asText)
    // Avro JSON encodes bytes defaults as ISO-8859-1 strings
    case ABytes => node.asText.getBytes(StandardCharsets.ISO_8859_1)
    case AArray(it) =>
      new GenericArrayData(node.elements().asScala.map(defaultValue(it, _)).toArray[Any])
    case AMap(v) =>
      val entries = node.properties().asScala.toSeq
      ArrayBasedMapData(
        entries.map(e => UTF8String.fromString(e.getKey)).toArray[Any],
        entries.map(e => defaultValue(v, e.getValue)).toArray[Any])
    // per the Avro spec a union default is interpreted as its FIRST branch
    case AUnion(bs) => if (node.isNull) null else defaultValue(bs.head, node)
    case ARecord(name, fs) => InternalRow.fromSeq(fs.map { f =>
      Option(node.get(f.name)).map(defaultValue(f.tpe, _))
        .orElse(f.default.map(defaultValue(f.tpe, _)))
        .getOrElse(throw new IllegalArgumentException(
          s"record default for $name is missing field ${f.name}"))
    })
  }

  // ---- decode (writer-schema driven, resolved into the reader shape) ----

  import RecordCodecs.readZigZag

  private def readLe(buf: Array[Byte], pos: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  def decodeResolved(w: AvroType, r: AvroType, buf: Array[Byte], pos: Int): (Any, Int) =
    (w, r) match {
      case (ANull, ANull) => (null, pos)
      case (ABoolean, ABoolean) => (buf(pos) != 0, pos + 1)
      case (AInt | ALong, _) =>
        val (v, p) = readZigZag(buf, pos)
        r match {
          case AInt => (v.toInt, p)
          case ALong => (v, p)
          case AFloat => (v.toFloat, p)
          case ADouble => (v.toDouble, p)
          case other => throw new IllegalArgumentException(s"cannot promote $w to $other")
        }
      case (AFloat, _) =>
        val v = java.lang.Float.intBitsToFloat(readLe(buf, pos, 4).toInt)
        r match {
          case AFloat => (v, pos + 4)
          case ADouble => (v.toDouble, pos + 4)
          case other => throw new IllegalArgumentException(s"cannot promote float to $other")
        }
      case (ADouble, ADouble) =>
        (java.lang.Double.longBitsToDouble(readLe(buf, pos, 8)), pos + 8)
      case (AString | ABytes, _) =>
        val (len, p) = readZigZag(buf, pos)
        val end = p + len.toInt
        r match {
          case AString => (UTF8String.fromBytes(buf, p, len.toInt), end)
          case ABytes => (java.util.Arrays.copyOfRange(buf, p, end), end)
          case other => throw new IllegalArgumentException(s"cannot promote $w to $other")
        }
      case (AArray(wi), AArray(ri)) =>
        val items = mutable.ArrayBuffer.empty[Any]
        var p = pos
        var more = true
        while (more) {
          val (count, p1) = readZigZag(buf, p)
          p = p1
          if (count == 0) more = false
          else {
            var n = count
            if (n < 0) { val (_, p2) = readZigZag(buf, p); p = p2; n = -n }
            var i = 0L
            while (i < n) {
              val (v, p3) = decodeResolved(wi, ri, buf, p)
              items += v; p = p3; i += 1
            }
          }
        }
        (new GenericArrayData(items.toArray), p)
      case (AMap(wv), AMap(rv)) =>
        val keys = mutable.ArrayBuffer.empty[Any]
        val vals = mutable.ArrayBuffer.empty[Any]
        var p = pos
        var more = true
        while (more) {
          val (count, p1) = readZigZag(buf, p)
          p = p1
          if (count == 0) more = false
          else {
            var n = count
            if (n < 0) { val (_, p2) = readZigZag(buf, p); p = p2; n = -n }
            var i = 0L
            while (i < n) {
              val (klen, pk) = readZigZag(buf, p)
              keys += UTF8String.fromBytes(buf, pk, klen.toInt)
              val (v, pv) = decodeResolved(wv, rv, buf, pk + klen.toInt)
              vals += v; p = pv; i += 1
            }
          }
        }
        (ArrayBasedMapData(keys.toArray, vals.toArray), p)
      case (AUnion(wbs), _) =>
        val (idx, p) = readZigZag(buf, pos)
        val branch = wbs(idx.toInt)
        r match {
          case AUnion(rbs) =>
            val rb = rbs.find(b => canResolve(branch, b)).getOrElse(
              throw new IllegalArgumentException(s"no reader branch for writer $branch"))
            decodeResolved(branch, rb, buf, p)
          case _ => decodeResolved(branch, r, buf, p)
        }
      case (_, AUnion(rbs)) =>
        val rb = rbs.find(b => canResolve(w, b)).getOrElse(
          throw new IllegalArgumentException(s"no reader branch for writer $w"))
        decodeResolved(w, rb, buf, pos)
      case (ARecord(_, wf), ARecord(_, rf)) =>
        val values = new Array[Any](rf.length)
        val readerIdx = rf.map(_.name).zipWithIndex.toMap
        var p = pos
        wf.foreach { f =>
          readerIdx.get(f.name) match {
            case Some(i) =>
              val (v, p2) = decodeResolved(f.tpe, rf(i).tpe, buf, p)
              values(i) = v; p = p2
            case None => p = skip(f.tpe, buf, p)
          }
        }
        val writerNames = wf.map(_.name).toSet
        rf.zipWithIndex.foreach { case (f, i) =>
          if (!writerNames.contains(f.name))
            values(i) = f.default.map(defaultValue(f.tpe, _)).getOrElse(
              throw new IllegalArgumentException(
                s"reader field '${f.name}' absent from writer schema and has no default"))
        }
        (new GenericInternalRow(values), p)
      case (a, b) =>
        throw new IllegalArgumentException(s"cannot decode writer $a as reader $b")
    }

  /** Advance past one value of writer type `t` without materializing it —
    * how writer-only fields are dropped. Negative array/map block counts
    * carry a byte size, letting whole blocks be jumped. */
  def skip(t: AvroType, buf: Array[Byte], pos: Int): Int = t match {
    case ANull => pos
    case ABoolean => pos + 1
    case AInt | ALong => readZigZag(buf, pos)._2
    case AFloat => pos + 4
    case ADouble => pos + 8
    case AString | ABytes =>
      val (len, p) = readZigZag(buf, pos)
      p + len.toInt
    case AArray(it) => skipBlocks(buf, pos, p => skip(it, buf, p))
    case AMap(v) => skipBlocks(buf, pos, { p =>
      val (klen, pk) = readZigZag(buf, p)
      skip(v, buf, pk + klen.toInt)
    })
    case AUnion(bs) =>
      val (idx, p) = readZigZag(buf, pos)
      skip(bs(idx.toInt), buf, p)
    case ARecord(_, fs) => fs.foldLeft(pos)((p, f) => skip(f.tpe, buf, p))
  }

  private def skipBlocks(buf: Array[Byte], pos: Int, skipOne: Int => Int): Int = {
    var p = pos
    var more = true
    while (more) {
      val (count, p1) = readZigZag(buf, p)
      p = p1
      if (count == 0) more = false
      else if (count < 0) {
        val (size, p2) = readZigZag(buf, p)
        p = p2 + size.toInt // sized block: jump it wholesale
      } else {
        var i = 0L
        while (i < count) { p = skipOne(p); i += 1 }
      }
    }
    p
  }

  // ---- encode (schema-driven, Catalyst values in) ----

  import RecordCodecs.writeZigZag

  private def writeLe(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def encode(t: AvroType, v: Any, out: ByteArrayOutputStream): Unit = t match {
    case ANull => ()
    case ABoolean => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case AInt => writeZigZag(out, v.asInstanceOf[Int].toLong)
    case ALong => writeZigZag(out, v.asInstanceOf[Long])
    case AFloat => writeLe(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]) & 0xffffffffL, 4)
    case ADouble => writeLe(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
    case AString =>
      val b = v.asInstanceOf[UTF8String].getBytes
      writeZigZag(out, b.length.toLong)
      out.write(b, 0, b.length)
    case ABytes =>
      val b = v.asInstanceOf[Array[Byte]]
      writeZigZag(out, b.length.toLong)
      out.write(b, 0, b.length)
    case AArray(it) =>
      val arr = v.asInstanceOf[ArrayData]
      val et = sparkType(it)
      if (arr.numElements() > 0) {
        writeZigZag(out, arr.numElements().toLong) // one block
        (0 until arr.numElements()).foreach(i => encode(it, arr.get(i, et), out))
      }
      writeZigZag(out, 0L)
    case AMap(vt) =>
      val m = v.asInstanceOf[MapData]
      val et = sparkType(vt)
      if (m.numElements() > 0) {
        writeZigZag(out, m.numElements().toLong)
        (0 until m.numElements()).foreach { i =>
          encode(AString, m.keyArray.get(i, StringType), out)
          encode(vt, m.valueArray.get(i, et), out)
        }
      }
      writeZigZag(out, 0L)
    case AUnion(bs) =>
      if (v == null) {
        val i = bs.indexOf(ANull)
        require(i >= 0, "null value but union has no null branch")
        writeZigZag(out, i.toLong)
      } else {
        val i = bs.indexWhere(_ != ANull)
        writeZigZag(out, i.toLong)
        encode(bs(i), v, out)
      }
    case ARecord(_, fs) =>
      val row = v.asInstanceOf[InternalRow]
      fs.zipWithIndex.foreach { case (f, i) =>
        encode(f.tpe, row.get(i, sparkType(f.tpe)), out)
      }
  }
}

/** struct (shaped like the schema) → Avro binary, driven by a constant
  * schema JSON fixed at plan time. */
case class AvroEncodeSchema(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val schema = AvroSchemaCodec.parse(schemaJson)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    try {
      val expected = AvroSchemaCodec.sparkType(schema)
      if (DataType.equalsStructurally(child.dataType, expected, ignoreNullability = true))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"avro_encode_schema input ${child.dataType.sql} does not match schema shape ${expected.sql}")
    } catch {
      case e: IllegalArgumentException => TypeCheckResult.TypeCheckFailure(e.getMessage)
    }
  override def nullSafeEval(input: Any): Any = {
    val out = new ByteArrayOutputStream()
    AvroSchemaCodec.encode(schema, input, out)
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): AvroEncodeSchema =
    copy(child = c)
  override def prettyName: String = "avro_encode_schema"
}

/** Avro binary written with `writerJson` → struct shaped by `readerJson`,
  * applying Avro schema resolution (defaults, skips, promotions). Schema
  * incompatibilities surface at analysis time; malformed payloads decode
  * to null. */
case class AvroDecodeSchema(child: Expression, writerJson: String, readerJson: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val writer = AvroSchemaCodec.parse(writerJson)
  @transient private lazy val reader = AvroSchemaCodec.parse(readerJson)
  override def dataType: DataType = AvroSchemaCodec.sparkType(reader)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    try {
      AvroSchemaCodec.validateResolution(writer, reader)
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"avro_decode_schema expects binary input, got ${child.dataType.sql}")
    } catch {
      case e: IllegalArgumentException => TypeCheckResult.TypeCheckFailure(e.getMessage)
    }
  override def nullSafeEval(input: Any): Any =
    try AvroSchemaCodec.decodeResolved(writer, reader, input.asInstanceOf[Array[Byte]], 0)._1
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => null }
  override protected def withNewChildInternal(c: Expression): AvroDecodeSchema =
    copy(child = c)
  override def prettyName: String = "avro_decode_schema"
}
