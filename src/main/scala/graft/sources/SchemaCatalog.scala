package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.types.StructType

/** In-engine schema-registry analog (SURVEY.md §2 A29).
  *
  * Mirrors the Confluent registry semantics the reference uses — subjects
  * named `<topic>-value`, create-if-absent registration, latest-version
  * lookup, id-addressed fetch (reference:
  * golang/proto/producer_2/pure_go_client/main_sarama.go:62-71
  * `assertSchema`; golang/proto/producer/main.go:29-31 `GetLatestSchema`;
  * commands.sh:22-39 versioned REST lookups) — as a driver-side catalog
  * object. Ids are embedded into wire-format frames by [[ConfluentSerde]]
  * exactly like the reference embeds registry ids
  * (golang/util/index.go:21-35).
  *
  * Scale note: the catalog is bounded metadata (one entry per
  * subject-version, not per record). It lives on the driver and travels to
  * executors inside the closure of whatever expression captured the id —
  * never a per-row lookup.
  */
final class SchemaCatalog {

  final case class Registered(
      id: Int, subject: String, version: Int, schemaJson: String,
      sparkSchema: Option[StructType])

  private val nextId = new AtomicInteger(1)
  private val byId = new ConcurrentHashMap[Int, Registered]()
  private val bySubject = new ConcurrentHashMap[String, List[Registered]]()

  /** Create-if-absent: registering a schema already present under the
    * subject returns the existing id (the reference's `assertSchema`). */
  def register(subject: String, schemaJson: String,
      sparkSchema: Option[StructType] = None): Registered = synchronized {
    val versions = bySubject.getOrDefault(subject, Nil)
    versions.find(_.schemaJson == schemaJson).getOrElse {
      val reg = Registered(nextId.getAndIncrement(), subject,
        versions.length + 1, schemaJson, sparkSchema)
      byId.put(reg.id, reg)
      bySubject.put(subject, versions :+ reg)
      reg
    }
  }

  /** `GetLatestSchema` — highest version under the subject. */
  def latest(subject: String): Option[Registered] =
    Option(bySubject.get(subject)).flatMap(_.lastOption)

  def byVersion(subject: String, version: Int): Option[Registered] =
    Option(bySubject.get(subject)).flatMap(_.find(_.version == version))

  def schemaById(id: Int): Option[Registered] = Option(byId.get(id))

  def subjects: Seq[String] = {
    import scala.jdk.CollectionConverters._
    bySubject.keySet.asScala.toSeq.sorted
  }
}

object SchemaCatalog {
  /** The reference's one registered value schema (golang/avenger.avsc:1-16),
    * under its book topic's subject. */
  val AvengerAvroJson: String =
    """{"type":"record","name":"avenger","namespace":"bbejeck.chapter_3.avro",
      |"fields":[{"name":"name","type":"string"},
      |{"name":"real_name","type":"string"},
      |{"name":"movies","type":{"type":"array","items":"string"},"default":[]}]}
      |""".stripMargin.replaceAll("\n", "")

  /** Catalog preloaded the way the reference's `commands.sh` seeds its
    * registry. */
  def withReferenceSchemas(): SchemaCatalog = {
    val c = new SchemaCatalog
    c.register("avro-avengers-value", AvengerAvroJson,
      Some(graft.functions.RecordCodecs.RecordSchema))
    c
  }
}
