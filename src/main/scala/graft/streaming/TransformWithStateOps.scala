package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Spark-4-native stateful operators on `transformWithState` — keyed value
  * state AND per-key timers in one API, the direct analog of the engine's
  * state nodes + `TimerManager` (SURVEY.md E3/E7; reference
  * `beavers/dag.py:95-154,501-518`). Requires the RocksDB state store
  * provider. */
object TransformWithStateOps {

  final case class KeyedEvent(key: String, eventTimeMs: Long)
  final case class SessionResult(key: String, events: Long, lastEventMs: Long)

  /** Per-key inactivity sessions: accumulate a count per key; (re)arm an
    * event-time timer `gapMs` past the latest event (one upcoming timer per
    * key, like `TimerManager`); when the watermark passes it, emit the
    * session and clear state. */
  final class InactivitySessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, KeyedEvent, SessionResult] {

    @transient private var counts: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[(Long, Long)](
        "counts", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[SessionResult] = {
      val prev = if (counts.exists()) counts.get() else (0L, 0L)
      var n = prev._1
      var lastTs = prev._2
      rows.foreach { r => n += 1; lastTs = math.max(lastTs, r.eventTimeMs) }
      counts.update((n, lastTs))
      // one upcoming timer per key: clear any previous, arm at last+gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(lastTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionResult] = {
      val out =
        if (counts.exists()) Iterator.single(SessionResult(key, counts.get()._1, counts.get()._2))
        else Iterator.empty
      counts.clear()
      out
    }
  }

  /** Wire the processor into a stream keyed by `key` with an event-time
    * watermark already applied to `eventTimeMs`'s source column. */
  def inactivitySessions(ds: Dataset[KeyedEvent], gapMs: Long): Dataset[SessionResult] = {
    implicit val outEnc: Encoder[SessionResult] = Encoders.product[SessionResult]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new InactivitySessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
