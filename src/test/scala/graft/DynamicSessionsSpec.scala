package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.DynamicSessions
import graft.streaming.DynamicSessions.{SessionEvent, fixedGap, purchaseWeightedGap}

/** Dynamic-gap sessionization (flatMapGroupsWithState, event-time
  * timeouts): in-batch session splits, watermark-driven emission, and the
  * per-event gap policy the built-in session_window can't express.
  */
class DynamicSessionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(minutes: Long) = new Timestamp(1704067200000L + minutes * 60000L)
  private val Gap = 30L * 60000L // 30 minutes

  private def run(events: Seq[SessionEvent], gap: DynamicSessions.GapPolicy,
      name: String) = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SessionEvent]
    ms.addData(events)
    // A far-future heartbeat advances the watermark so open sessions close.
    ms.addData(SessionEvent(999L, t(10000), "heartbeat", 0.0))
    val q = DynamicSessions.sessionize(
      ms.toDS().withWatermark("ts", "10 minutes"), gap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"session_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)]
      .collect().filter(_._1 != 999L).sortBy(r => (r._1, r._2.getTime))
  }

  test("events within the gap merge; a gap-exceeding event splits the session") {
    val events = Seq(
      SessionEvent(1L, t(0), "view", 1.0),
      SessionEvent(1L, t(20), "view", 2.0),   // within 30 min → same session
      SessionEvent(1L, t(100), "view", 4.0),  // 80 min later → new session
      SessionEvent(2L, t(5), "view", 8.0))
    val out = run(events, fixedGap(Gap), "dyn1")
    assert(out.map(r => (r._1, r._4, r._5)).toSeq ==
      Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    assert(out(0)._2 == t(0) && out(0)._3 == t(20))
    assert(out(1)._2 == t(100))
  }

  test("fixed-gap policy agrees with the built-in session_window") {
    val events = (0 until 60).map { i =>
      SessionEvent((i % 3).toLong, t(i * 7L), "view", 1.0)
    }
    val out = run(events, fixedGap(Gap), "dyn2")
    val builtin = spark.createDataset(events)
      .groupBy(org.apache.spark.sql.functions.session_window($"ts", "30 minutes"),
        $"user_id")
      .count()
      .select($"user_id", $"session_window.start", $"count")
      .as[(Long, Timestamp, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime))
    assert(out.map(r => (r._1, r._2, r._4)).toSeq == builtin.toSeq)
  }

  test("purchase-weighted gap keeps sessions open that a fixed gap would split") {
    val events = Seq(
      SessionEvent(1L, t(0), "purchase", 10.0),
      SessionEvent(1L, t(70), "view", 1.0),  // 70 min: inside 3×30 purchase gap
      SessionEvent(2L, t(0), "view", 1.0),
      SessionEvent(2L, t(70), "view", 1.0))  // 70 min: beyond the plain 30 gap
    val out = run(events, purchaseWeightedGap(Gap), "dyn3")
    val byUser = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byUser(1L) == 1, s"purchase gap should merge user 1: $out")
    assert(byUser(2L) == 2, s"plain gap should split user 2: $out")
  }

  test("streaming dynamic sessions == batch lag/cumsum formulation (dynamic_sessions)") {
    // The flatMapGroupsWithState operator and the oracle-checked batch
    // window idiom must implement the SAME semantics — purchase-weighted
    // gaps over a 90-event mixed stream.
    val events = (0 until 90).map { i =>
      SessionEvent((i % 3).toLong, t(i * 11L),
        if (i % 5 == 0) "purchase" else "view", (i % 4) + 0.5)
    }
    val streamed = run(events, purchaseWeightedGap(Gap), "dynparity")
      .map(r => (r._1, r._2.getTime * 1000L, r._3.getTime * 1000L, r._4, r._5)).toSeq
    val batchIn = spark.createDataset(events).toDF()
      .withColumn("event_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val batch = graft.operators.Relational
      .dynamicSessionizeDf(batchIn, 30L * 60 * 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(streamed === batch && streamed.size > 30,
      s"streaming=${streamed.take(5)}... batch=${batch.take(5)}...")
  }
}
