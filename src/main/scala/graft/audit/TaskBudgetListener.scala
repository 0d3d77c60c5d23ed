package graft.audit

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Aggregated task-metric totals for one measured window — the numbers a
  * cluster operator budgets by. All byte counts are sums over tasks;
  * `peakExecMem` is the max single-task execution-memory peak (the
  * per-slot pressure figure — a task peaking above
  * executor-mem/cores is the spill/OOM predictor at scale). */
final case class BudgetSnapshot(
    tasks: Long,
    inputBytes: Long,
    shuffleReadBytes: Long,
    shuffleWriteBytes: Long,
    memorySpillBytes: Long,
    diskSpillBytes: Long,
    peakExecMem: Long,
    maxTaskShuffleRead: Long = 0L) {
  /** Share of ALL shuffle-read bytes consumed by the single hungriest
    * task — the straggler/skew signal: a balanced stage sits near
    * 1/parallelism, a hot-key stage near the hot key's row share
    * (SkewRehearsalSpec asserts on this under Zipf input). */
  def maxTaskShuffleShare: Double =
    if (shuffleReadBytes == 0) 0.0
    else maxTaskShuffleRead.toDouble / shuffleReadBytes
  def pretty: String = {
    def mb(b: Long): String = f"${b / 1048576.0}%.1fMB"
    s"tasks=$tasks input=${mb(inputBytes)} shufR=${mb(shuffleReadBytes)} " +
      s"shufW=${mb(shuffleWriteBytes)} spillMem=${mb(memorySpillBytes)} " +
      s"spillDisk=${mb(diskSpillBytes)} peakTaskMem=${mb(peakExecMem)} " +
      f"maxTaskShufR=${mb(maxTaskShuffleRead)} (${maxTaskShuffleShare}%.2f)"
  }
}

/** SparkListener that totals task metrics so scale budgets can be
  * ASSERTED, not inferred from plan shapes alone: ScaleBudgetSpec pins
  * per-family shuffle/spill ceilings the way PlanSpec pins plan shapes,
  * and [[ScaleAudit]] dumps the full-surface table behind SCALE.md.
  *
  * The listener bus is async and its drain API is private[spark], so
  * [[quiesce]] polls the snapshot until it is stable — correct for the
  * measure-one-action-at-a-time harness use (nothing else is running),
  * not a general concurrency barrier. */
final class TaskBudgetListener extends SparkListener {
  private val tasks = new AtomicLong
  private val input = new AtomicLong
  private val shufR = new AtomicLong
  private val shufW = new AtomicLong
  private val memSpill = new AtomicLong
  private val diskSpill = new AtomicLong
  private val peak = new AtomicLong
  private val maxShufR = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      tasks.incrementAndGet()
      input.addAndGet(m.inputMetrics.bytesRead)
      shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
      maxShufR.getAndAccumulate(m.shuffleReadMetrics.totalBytesRead, math.max(_, _))
      ()
    }
  }

  def reset(): Unit = {
    quiesce() // drop straggler events from the previous window first
    Seq(tasks, input, shufR, shufW, memSpill, diskSpill, peak, maxShufR)
      .foreach(_.set(0L))
  }

  def snapshot(): BudgetSnapshot = BudgetSnapshot(tasks.get, input.get,
    shufR.get, shufW.get, memSpill.get, diskSpill.get, peak.get, maxShufR.get)

  /** Wait for the async listener bus to drain: poll until two consecutive
    * reads 50 ms apart agree (bounded at ~5 s). */
  def quiesce(): BudgetSnapshot = {
    var prev = snapshot()
    var i = 0
    while (i < 100) {
      Thread.sleep(50)
      val cur = snapshot()
      if (cur == prev) return cur
      prev = cur
      i += 1
    }
    prev
  }
}

object TaskBudgetListener {
  /** Run `action` with a fresh listener attached and return its settled
    * budget; detaches the listener afterwards. */
  def measure[A](spark: SparkSession)(action: => A): (A, BudgetSnapshot) = {
    val l = new TaskBudgetListener
    spark.sparkContext.addSparkListener(l)
    try {
      val a = action
      (a, l.quiesce())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
