package graft

import java.sql.Timestamp
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming twins on MemoryStream: AvailableNow drains must agree with
  * the batch plans over the same rows (the A32 run-once parity the
  * reference exercises by hand). */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(minutes: Long) = new Timestamp(1704067200000L + minutes * 60000L)

  // 3 users × interleaved types across 3 hours, incl. duplicate keys
  private val rows: Seq[Ev] = (0 until 120).map { i =>
    Ev(i.toLong, t(i * 2L), (i % 3).toLong,
      if (i % 4 == 0) "purchase" else if (i % 4 == 1) "view" else "click",
      (i % 7) + 0.25, s"""{"k": $i}""")
  }

  private def batchDf = spark.createDataset(rows).toDF()

  test("windowed aggregation: streaming complete-mode == batch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = StreamOps.windowedAgg(ms.toDF()).writeStream
      .format("memory").queryName("wagg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("wagg")
      .select($"w_start", $"event_type", $"n", $"total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(3) * 100) / 100)).toSet
    val batch = StreamOps.windowedAgg(batchDf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(3) * 100) / 100)).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("sliding windows: streaming complete-mode == batch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = StreamOps.slidingWindow(ms.toDF()).writeStream
      .format("memory").queryName("swin").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("swin")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamOps.slidingWindow(batchDf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // hop = 4 windows per event: distinct sliding window-starts strictly
    // exceed the TUMBLING aggregation's distinct window-starts on the same
    // data (the 15-min hop slices each 1-hour tumbling window four ways)
    val tumblingStarts = StreamOps.windowedAgg(batchDf)
      .collect().map(_.getTimestamp(0)).toSet
    assert(streamed.map(_._1).size > tumblingStarts.size)
  }

  test("session windows: streaming complete-mode == batch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = StreamOps.sessionWindow(ms.toDF()).writeStream
      .format("memory").queryName("sess").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess")
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = StreamOps.sessionWindow(batchDf)
      .select($"user_id", $"session_start", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark keeps one row per key") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = StreamOps.dedupWithinWatermark(ms.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup").select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === got.distinct.length)
    val expectedKeys = rows.map(e => (e.user_id, e.event_type)).distinct.toSet
    assert(got.toSet === expectedKeys)
  }

  test("running sales totals (update-mode KTable aggregation)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = StreamOps.salesTotals(ms.toDF()).writeStream
      .format("memory").queryName("sales").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sales")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val batch = StreamOps.salesTotals(batchDf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("foreachBatch dispatch fan-out routes every event type once per batch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val counts = TrieMap.empty[String, Long]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    val q = StreamOps.dispatchFanout(
        ms.toDF(), Seq("purchase", "view", "click"), ckpt,
        (tpe, df) => counts.updateWith(tpe) { prev => Some(prev.getOrElse(0L) + df.count()) })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val expected = rows.groupBy(_.event_type).view.mapValues(_.size.toLong).toMap
    assert(counts.toMap === expected)
  }

  test("append-mode window agg drops data later than the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    def ev(id: Long, minute: Long) =
      Ev(id, t(minute), 1L, "purchase", 1.0, "{}")
    val q = StreamOps.windowedAgg(ms.toDF()).writeStream
      .format("memory").queryName("late").outputMode("append").start()
    try {
      ms.addData(ev(0, 0), ev(1, 5)); q.processAllAvailable()
      ms.addData(ev(2, 200)); q.processAllAvailable()   // sets wm = 190 min
      // wm=190 now in force: hour-0 window [0,60) closes and emits n=2
      ms.addData(ev(3, 201)); q.processAllAvailable()
      // id=4 is 190 minutes late (ts < wm) → must be dropped, not start a
      // zombie state row for the already-emitted hour-0 window
      ms.addData(ev(4, 1), ev(5, 400)); q.processAllAvailable()
      ms.addData(ev(6, 401)); q.processAllAvailable()   // wm = 390: closes [180,240)
      val got = spark.table("late").select($"w_start", $"n").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSet
      assert(got === Set((t(0).getTime, 2L), (t(180).getTime, 2L)),
        s"late row leaked into emitted windows: $got")
    } finally q.stop()
  }

  test("idempotent batch sink: a replayed batch rewrites, never duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val b0 = batchDf.limit(40)
    StreamOps.writeBatchIdempotent(b0, out, batchId = 0L)
    StreamOps.writeBatchIdempotent(b0, out, batchId = 0L) // replay: same batch
    assert(spark.read.parquet(out).count() === 40)
    StreamOps.writeBatchIdempotent(batchDf.limit(10), out, batchId = 1L)
    val all = spark.read.parquet(out)
    assert(all.count() === 50)
    assert(all.select("batch_id").distinct().count() === 2)
    // end-to-end through the streaming writer
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val out2 = java.nio.file.Files.createTempDirectory("graft-idem2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idem-ck").toString
    val q = StreamOps.idempotentParquetSink(ms.toDF(), out2, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out2).count() === rows.size)
  }

  test("kafka source/sink configs assemble the reference's options") {
    val src = StreamOps.KafkaSourceConfig(
      Seq("localhost:9092"), Seq("first-topic", "second-topic"),
      maxOffsetsPerTrigger = Some(25))
    assert(src.options("subscribe") === "first-topic,second-topic")
    assert(src.options("startingOffsets") === "earliest")
    assert(src.options("maxOffsetsPerTrigger") === "25")
    val sink = StreamOps.KafkaSinkConfig(
      Seq("localhost:9092"), "out-topic", "/tmp/ckpt")
    assert(sink.options("kafka.acks") === "1")
    assert(sink.options("kafka.retries") === "10")
    assert(sink.options("checkpointLocation") === "/tmp/ckpt")
    // reader/writer must be constructible without a broker (lazy until start)
    src.reader(spark)
    implicit val ctx = spark.sqlContext
    sink.writer(StreamOps.toKafkaRecords(MemoryStream[Ev].toDF(), "user_id"))
  }

  test("toKafkaRecords shapes key/value binary columns") {
    val rec = StreamOps.toKafkaRecords(batchDf, "user_id")
    assert(rec.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("key", "binary"), ("value", "binary")))
    val first = rec.orderBy(lit(1)).limit(1).collect()(0)
    assert(new String(first.getAs[Array[Byte]](0)) === "0")
  }
}
