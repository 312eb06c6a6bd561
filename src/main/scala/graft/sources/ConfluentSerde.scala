package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{avro_record_decode, avro_record_encode,
  proto_record_decode, proto_record_encode, wire_decode, wire_encode}

/** High-level registry serde (SURVEY.md §2 A28) — the DataFrame analog of
  * the reference's `pbserde.NewSerializer`/`NewDeserializer` pair
  * (reference: golang/proto/producer_2/main.go:24-31;
  * golang/proto/consumer_2/main.go:29-53): callers hand over a record
  * struct and a subject; wire framing and schema-id bookkeeping happen
  * inside.
  *
  * The schema id is resolved ONCE on the driver from the [[SchemaCatalog]]
  * and baked into the plan as a literal — per-row work is only the
  * codegen'd frame/codec expressions, and nothing talks to the catalog from
  * an executor.
  */
final class ConfluentSerde(catalog: SchemaCatalog) {

  private def idFor(subject: String, schemaJson: String): Int =
    catalog.register(subject, schemaJson).id

  /** struct column → framed Avro binary (`0x00 | id | avro`). */
  def avroEncoded(record: Column, subject: String): Column =
    wire_encode(
      lit(idFor(subject, SchemaCatalog.AvengerAvroJson)),
      avro_record_encode(record))

  /** framed Avro binary → struct<schema_id:int, record:struct>. */
  def avroDecoded(frame: Column): Column = {
    val parsed = wire_decode(frame)
    struct(
      parsed.getField("schema_id").as("schema_id"),
      avro_record_decode(parsed.getField("payload")).as("record"))
  }

  /** struct column → framed proto3 binary (`0x00 | id | 0x00 | proto`). */
  def protoEncoded(record: Column, subject: String): Column =
    wire_encode(
      lit(idFor(subject, "proto3:avenger")),
      proto_record_encode(record), proto = true)

  /** framed proto3 binary → struct<schema_id:int, record:struct>. */
  def protoDecoded(frame: Column): Column = {
    val parsed = wire_decode(frame, proto = true)
    struct(
      parsed.getField("schema_id").as("schema_id"),
      proto_record_decode(parsed.getField("payload")).as("record"))
  }

  /** E3 producer path over a whole DataFrame: pack `cols` into a record
    * struct, frame it, and shape (key, value) for a Kafka sink. */
  def toFramedKafkaRecords(df: DataFrame, keyCol: String, subject: String,
      proto: Boolean = false): DataFrame = {
    val record = struct(df.columns.filter(_ != keyCol).map(col): _*)
    val value =
      if (proto) protoEncoded(record, subject) else avroEncoded(record, subject)
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      value.as("value"))
  }
}
