package graft.ext

import org.apache.spark.sql.SparkSession

/** Driver-side CONCURRENT construction of independent eagerly-materialized
  * frames (optimization-guide §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * the per-cutoff connected-components ladders of q264/q305 were only
  * sequential because the query builder called their eager
  * `localCheckpoint(true)` actions one after another, leaving most cores
  * idle during each tiny ladder round (the measured 32-core anti-scaling
  * tier: KB-size exchanges, fixed scheduling cost per round).
  *
  * Results are unchanged — the SAME frames are built, only their driver
  * threads overlap; FIFO scheduling back-fills executors freed by one
  * ladder's tail with the next ladder's tasks.
  *
  * Each worker thread sets the ACTIVE session first: `SparkSession`'s
  * active-session is a thread-local, and plan nodes created on a thread
  * without one can carry a null session into eager checkpoint
  * materialization (the Spark-internal `resetMetrics` NPE the r14 gate
  * hit). Errors from any branch propagate (unwrapped) to the caller. */
private[ext] object DriverPar {
  def map[A, B](spark: SparkSession, items: Seq[A], maxConc: Int = 4)
      (f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConc, items.size))
    try {
      val futs = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = {
            SparkSession.setActiveSession(spark)
            f(a)
          }
        })
      }
      futs.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
