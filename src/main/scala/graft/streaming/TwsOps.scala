package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` twins — Spark 4's arbitrary-state API
  * (SPARK-46815), the successor to `mapGroupsWithState` a production
  * deployment targets: RocksDB-backed typed state cells, per-state TTL,
  * and timers, instead of one opaque state object per key.
  *
  * [[RunningTotals]] is the KTable running aggregate (A16/A17's
  * per-key fold) as a `StatefulProcessor`: one `ValueState` cell per
  * user holds (count, revenue-in-cents); each micro-batch folds its rows
  * into the cell and emits the updated row (update-mode changelog).
  * Revenue accumulates as exact integer cents, so batch/streaming parity
  * is bit-exact regardless of row order — the same money discipline as
  * the batch `moneySum`.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`); the spec sets it
  * per-query. At scale this is the API that gives per-cell TTL (state
  * GC without a watermark fold) and timer-driven emission.
  */
object TwsOps {

  /** Update-mode changelog row: running totals per user. */
  case class Totals(user_id: Long, n_events: Long, revenue_cents: Long)

  class RunningTotals extends StatefulProcessor[Long, (Long, Double), Totals] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[Totals](
        "totals", Encoders.product[Totals], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[Totals] = {
      var t = Option(state.get()).getOrElse(Totals(key, 0L, 0L))
      rows.foreach { case (_, v) =>
        t = Totals(key, t.n_events + 1, t.revenue_cents + math.round(v * 100.0))
      }
      state.update(t)
      Iterator.single(t)
    }
  }

  /** (user_id, value) stream → running per-user totals changelog. */
  def runningTotals(events: Dataset[(Long, Double)]): Dataset[Totals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Update())
  }
}
