package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ONE reference behavior never executed end-to-end in this sandbox:
  * a live Kafka broker round trip (the reference's whole runtime is a
  * real broker — docker-compose.yml:1, golang/chapter_4/sales/
  * sales_consumer_client.go:21-63 consume loop with offset commit).
  *
  * Everything here is environment-gated and cancels cleanly when the
  * environment can't run it, which is both of:
  *   - `SPARK_GRAFT_KAFKA_BOOTSTRAP` (e.g. `localhost:9092`) — no broker
  *     ships in this sandbox (zero egress, no docker);
  *   - the `spark-sql-kafka-0-10` connector on the classpath — the Spark
  *     distribution at /opt/spark/jars does not bundle it, and (checked
  *     round 12) the offline dependency cache holds no
  *     spark-sql-kafka/kafka-clients artifact either, so a Test-scope
  *     library dependency cannot resolve in this sandbox. Both gates are
  *     genuinely environmental; on a machine with a broker, add the
  *     connector with --packages or drop its jar on the classpath.
  * When both are present the test is a real integration proof: batch
  * produce through the Kafka sink, streaming consume with AvailableNow,
  * per-partition offset contiguity (the consumer-side view of the
  * reference's committed-offset invariant), and value-set equality.
  */
class KafkaIntegrationSpec extends SparkSpecBase {
  import spark.implicits._

  private val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  test("live broker: produce -> AvailableNow consume -> contiguous offsets") {
    assume(bootstrap.isDefined,
      "SPARK_GRAFT_KAFKA_BOOTSTRAP unset — no live broker in this environment")
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector not on the classpath")
    val bs = bootstrap.get
    val topic = s"graft_smoke_${ProcessHandle.current().pid()}"
    val n = 100L

    spark.range(n)
      .select(($"id" % 8).cast("string").as("key"),
        concat(lit("v"), $"id").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()

    val q = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value", "partition", "offset")
      .writeStream.format("memory").queryName("kafka_smoke")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "AvailableNow drain timed out")

    val rows = spark.table("kafka_smoke").cache()
    assert(rows.count() === n)
    // per-partition offsets must be contiguous from the earliest — the
    // reference's consume loop asserts exactly this before committing
    spark.table("kafka_smoke")
      .groupBy($"partition")
      .agg(min($"offset").as("lo"), max($"offset").as("hi"),
        count(lit(1)).as("c"))
      .collect()
      .foreach { r =>
        assert(r.getLong(2) - r.getLong(1) + 1 === r.getLong(3),
          s"offset gap in partition ${r.getInt(0)}")
      }
    assert(rows.select($"value").as[String].collect().toSet ===
      (0L until n).map(i => s"v$i").toSet)
  }
}
