package graft.ext

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for the intermediate frames graft operators cache internally
  * (shared subtrees that a single downstream action would otherwise execute
  * several times — the q26 `sh.cache()` lesson, DEVNOTES).
  *
  * Spark gives those caches session lifetime: in a long-lived session that
  * invokes `prefixJaccardPairs` / `containmentPairs` / `semDeDupWith` /
  * `curationFunnel` repeatedly, the cached (possibly disk-spilled) blocks
  * accumulate until the session ends. Operators therefore `pin` instead of
  * bare `.cache()`, and a driver loop calls [[releaseAll]] between pipeline
  * invocations (as `Verify`/`Bench` do via `spark.catalog.clearCache()`,
  * which drops the blocks but not this registry's handles — releaseAll does
  * both and is cheap to call redundantly).
  *
  * Unpersisting is NEVER a correctness hazard: an unpersisted frame simply
  * recomputes (Spark re-executes the subtree per reference), so releasing
  * "too early" costs time, not answers.
  */
object PinnedCache {

  private val pinned = new ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and remember the handle for a later [[releaseAll]]. */
  def pin(df: DataFrame): DataFrame = {
    val cached = df.cache()
    pinned.add(cached)
    cached
  }

  /** Unpersist every pinned frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = {
    var df = pinned.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = pinned.poll()
    }
  }

  /** Number of currently-pinned frames (test/inspection hook). */
  def size: Int = pinned.size()
}
