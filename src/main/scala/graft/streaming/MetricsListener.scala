package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import graft.core.DagMetrics

/** Maps Structured Streaming progress events onto the engine's
  * DagMetrics-shaped surface (reference `DagMetrics`/`ExecutionMetrics`,
  * `beavers/dag.py:381-388`, `beavers/kafka.py:399-446`): cycles =
  * micro-batches, notifications/updated rows = input/output row counts,
  * plus per-stage durations. Attach with
  * `spark.streams.addListener(new MetricsListener)`. */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchStageTimings(
      batchId: Long,
      inputRows: Long,
      durationMs: Map[String, Long],
      stateRowsTotal: Long,
  )

  private val lock = new Object
  private var dagMetrics = DagMetrics()
  private val timings = mutable.ArrayBuffer.empty[BatchStageTimings]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = lock.synchronized {
    val p = event.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val updatedRows = p.stateOperators.map(_.numRowsUpdated).sum
    dagMetrics = dagMetrics.copy(
      notificationCount = dagMetrics.notificationCount + p.numInputRows,
      updatedNodeCount = dagMetrics.updatedNodeCount + updatedRows,
      cycleCount = dagMetrics.cycleCount + 1)
    timings += BatchStageTimings(
      batchId = p.batchId,
      inputRows = p.numInputRows,
      durationMs = Option(p.durationMs).map { m =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, v) => k -> v.longValue() }.toMap
      }.getOrElse(Map.empty),
      stateRowsTotal = stateRows)
  }

  def flushMetrics(): DagMetrics = lock.synchronized {
    val out = dagMetrics
    dagMetrics = DagMetrics()
    out
  }

  def stageTimings: Seq[BatchStageTimings] = lock.synchronized(timings.toSeq)
}
