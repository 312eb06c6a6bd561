package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.{avro_decode_schema, avro_encode_schema, AvroSchemaCodec, RecordCodecs}

/** Avro reader/writer schema resolution (reference:
  * golang/avro/avenger_avro.go:41-62 DeserializeAvengerAvroFromSchema):
  * default fill, unknown-field skip, by-name matching, promotions, unions.
  */
class AvroEvolutionSpec extends SparkSpecBase {
  import spark.implicits._
  import AvroSchemaCodec._

  private def rec(fields: String*) =
    s"""{"type":"record","name":"r","fields":[${fields.mkString(",")}]}"""
  private def f(name: String, tpe: String, extra: String = "") =
    s"""{"name":"$name","type":$tpe$extra}"""

  private val readerAvenger = sources.SchemaCatalog.AvengerAvroJson

  test("reader-only field with a default fills it (movies -> [])") {
    val v1 = rec(f("name", "\"string\""), f("real_name", "\"string\""))
    val out = Seq(("Thor", "Odinson")).toDF("n", "rn")
      .select(avro_decode_schema(
        avro_encode_schema(struct($"n".as("name"), $"rn".as("real_name")), v1),
        v1, readerAvenger).as("d"))
      .selectExpr("d.name", "d.real_name", "size(d.movies)").collect().head
    assert(out.getString(0) == "Thor" && out.getString(1) == "Odinson")
    assert(out.getInt(2) == 0, "movies default [] not applied")
  }

  test("writer-only fields are skip-decoded (string, long, array, nested record)") {
    val v2 = rec(
      f("power_level", "\"long\""),
      f("name", "\"string\""),
      f("aliases", """{"type":"array","items":"string"}"""),
      f("origin", rec(f("planet", "\"string\""), f("year", "\"int\""))),
      f("real_name", "\"string\""),
      f("movies", """{"type":"array","items":"string"}""", ""","default":[]"""))
    val out = Seq(("Hulk", "Banner", Seq("Ragnarok", "Endgame"))).toDF("n", "rn", "m")
      .select(avro_decode_schema(
        avro_encode_schema(struct(
          lit(9000L).as("power_level"), $"n".as("name"),
          array(lit("Jade Giant")).as("aliases"),
          struct(lit("Earth").as("planet"), lit(1962).as("year")).as("origin"),
          $"rn".as("real_name"), $"m".as("movies")), v2),
        v2, readerAvenger).as("d"))
      .selectExpr("d.name", "d.real_name", "d.movies").collect().head
    assert(out.getString(0) == "Hulk" && out.getString(1) == "Banner")
    assert(out.getSeq[String](2) == Seq("Ragnarok", "Endgame"))
  }

  test("fields match by name across reordered reader schemas") {
    val writer = rec(f("a", "\"string\""), f("b", "\"string\""))
    val reader = rec(f("b", "\"string\""), f("a", "\"string\""))
    val out = Seq(("va", "vb")).toDF("x", "y")
      .select(avro_decode_schema(
        avro_encode_schema(struct($"x".as("a"), $"y".as("b")), writer),
        writer, reader).as("d"))
      .selectExpr("d.a", "d.b").collect().head
    assert(out.getString(0) == "va" && out.getString(1) == "vb")
  }

  test("numeric and string/bytes promotions") {
    val writer = rec(f("i", "\"int\""), f("l", "\"long\""), f("fl", "\"float\""),
      f("s", "\"string\""))
    val reader = rec(f("i", "\"long\""), f("l", "\"double\""), f("fl", "\"double\""),
      f("s", "\"bytes\""))
    val out = Seq((7, 11L, 2.5f, "hi")).toDF("i", "l", "fl", "s")
      .select(avro_decode_schema(
        avro_encode_schema(struct($"i", $"l", $"fl", $"s"), writer),
        writer, reader).as("d"))
      .selectExpr("d.i", "d.l", "d.fl", "CAST(d.s AS STRING)").collect().head
    assert(out.getLong(0) == 7L && out.getDouble(1) == 11.0 &&
      out.getDouble(2) == 2.5 && out.getString(3) == "hi")
  }

  test("reader field missing from writer without a default fails at analysis") {
    val writer = rec(f("name", "\"string\""))
    val reader = rec(f("name", "\"string\""), f("required_new", "\"string\""))
    val e = intercept[Exception] {
      Seq("x").toDF("n")
        .select(avro_decode_schema(
          avro_encode_schema(struct($"n".as("name")), writer), writer, reader))
        .collect()
    }
    assert(e.getMessage.contains("required_new"), s"wrong error: ${e.getMessage}")
  }

  test("union [null, string] roundtrips nulls and values") {
    val schema = rec(f("name", "\"string\""), f("nick", """["null","string"]"""))
    val out = Seq(("a", Some("x")), ("b", None)).toDF("n", "k")
      .select($"n", avro_decode_schema(
        avro_encode_schema(struct($"n".as("name"), $"k".as("nick")), schema),
        schema, schema).as("d"))
      .selectExpr("n", "d.nick").orderBy($"n").collect()
    assert(out(0).getString(1) == "x" && out(1).isNullAt(1))
  }

  test("schema-driven encode of the avenger schema is byte-compatible with RecordCodecs") {
    val viaSchema = Seq(("Thor", "Odinson", Seq("Ragnarok", "Endgame")))
      .toDF("name", "real_name", "movies")
      .select(avro_encode_schema(struct($"name", $"real_name", $"movies"),
        readerAvenger))
      .collect().head.getAs[Array[Byte]](0)
    val direct = RecordCodecs.avroEncode("Thor", "Odinson", Seq("Ragnarok", "Endgame"))
    assert(viaSchema.sameElements(direct),
      s"${viaSchema.mkString(",")} != ${direct.mkString(",")}")
  }

  test("skip jumps sized (negative-count) array blocks wholesale") {
    // hand-build: array<string> as one sized block of 2 items, then a long 42
    val out = new ByteArrayOutputStream()
    val items = new ByteArrayOutputStream()
    Seq("aa", "bbb").foreach { s =>
      RecordCodecs.writeZigZag(items, s.length.toLong)
      items.write(s.getBytes("UTF-8"))
    }
    RecordCodecs.writeZigZag(out, -2L)                  // negative count
    RecordCodecs.writeZigZag(out, items.size().toLong)  // block byte size
    out.write(items.toByteArray)
    RecordCodecs.writeZigZag(out, 0L)                   // terminator
    RecordCodecs.writeZigZag(out, 42L)                  // trailing long
    val buf = out.toByteArray
    val p = AvroSchemaCodec.skip(AArray(AString), buf, 0)
    val (v, _) = AvroSchemaCodec.decodeResolved(ALong, ALong, buf, p)
    assert(v == 42L, "sized-block skip landed at the wrong offset")
  }

  test("decode reads sized (negative-count) array blocks") {
    val out = new ByteArrayOutputStream()
    val items = new ByteArrayOutputStream()
    Seq("x", "yz").foreach { s =>
      RecordCodecs.writeZigZag(items, s.length.toLong)
      items.write(s.getBytes("UTF-8"))
    }
    RecordCodecs.writeZigZag(out, -2L)
    RecordCodecs.writeZigZag(out, items.size().toLong)
    out.write(items.toByteArray)
    RecordCodecs.writeZigZag(out, 0L)
    val (v, _) = AvroSchemaCodec.decodeResolved(
      AArray(AString), AArray(AString), out.toByteArray, 0)
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until arr.numElements()).map(arr.getUTF8String(_).toString) == Seq("x", "yz"))
  }

  test("map values resolve and roundtrip") {
    val schema = rec(f("tags", """{"type":"map","values":"int"}"""))
    val readerPromoted = rec(f("tags", """{"type":"map","values":"long"}"""))
    val out = Seq(1).toDF("x")
      .select(avro_decode_schema(
        avro_encode_schema(struct(
          map(lit("a"), lit(1), lit("b"), lit(2)).as("tags")), schema),
        schema, readerPromoted).as("d"))
      .selectExpr("d.tags['a']", "d.tags['b']").collect().head
    assert(out.getLong(0) == 1L && out.getLong(1) == 2L)
  }

  test("avro_evolution SQL surface is callable") {
    graft.plans.GraftExtensions.register(spark)
    val v1 = rec(f("name", "\"string\""))
    val got = spark.sql(
      s"""SELECT avro_decode_schema(
         |  avro_encode_schema(named_struct('name', 'Cap'), '$v1'),
         |  '$v1',
         |  '${rec(f("name", "\"string\""),
                  f("movies", """{"type":"array","items":"string"}""", ""","default":["First Avenger"]"""))}'
         |) AS d""".stripMargin)
      .selectExpr("d.name", "d.movies[0]").collect().head
    assert(got.getString(0) == "Cap" && got.getString(1) == "First Avenger")
  }
}
