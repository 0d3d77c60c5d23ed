package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mappings for the engine's stateful operators
  * (SURVEY.md §2.1 E3/E7/W4): the production path when a query runs as one
  * continuous stream instead of driver-orchestrated cycles.
  *
  * Scale notes: all of these are keyed-state operators — state lives
  * partitioned by key in the state store (RocksDB at cluster scale), sized
  * by distinct keys, not input rows. Watermarks bound state for windowed
  * aggregations.
  */
object Streaming {

  /** Streaming last-by-key upsert (W4 as a continuous query): keeps the
    * row with the max ordering per key via `flatMapGroupsWithState` in
    * Update mode — emits only keys touched by the micro-batch, matching the
    * reference's update-propagation contract (only changed keys flow). */
  def streamingLastByKeys[T: Encoder, K: Encoder](
      ds: Dataset[T], keyOf: T => K, newerThan: (T, T) => Boolean): Dataset[T] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[T, T](OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          var current = state.getOption
          var changed = false
          rows.foreach { r =>
            if (current.forall(c => newerThan(r, c))) { current = Some(r); changed = true }
          }
          current.foreach(state.update)
          if (changed) current.iterator else Iterator.empty
      }

  /** Streaming running word/key count in Update mode — the reference's
    * flagship kafka example (`examples/kafka_concepts.py:12-31`): emits
    * (key, count) for keys touched this micro-batch only. */
  def runningCounts(words: DataFrame, keyCol: String): DataFrame =
    words.groupBy(col(keyCol)).count()

  /** Tumbling event-time window aggregation with a watermark bounding state
    * (replay `frequency` bucketing as a continuous query). */
  def windowedSum(events: DataFrame, tsCol: String, valueCol: String,
      window: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("event_cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_cnt"), col("sum_value"))

  /** Sliding event-time window aggregation (window + slide). */
  def slidingSum(events: DataFrame, tsCol: String, valueCol: String,
      window: String, slide: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window, slide))
      .agg(count(lit(1)).as("event_cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_cnt"), col("sum_value"))

  /** Session windows with an inactivity gap — the built-in counterpart of
    * [[TransformWithStateOps.inactivitySessions]]. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("event_cnt"))
      .select(col(keyCol), col("session_window.start").as("session_start"), col("event_cnt"))

  /** Per-key cutoff (E8 as a continuous operator): suppress records whose
    * value is unchanged vs the previous record for the key — changelog
    * suppression via keyed state. */
  def streamingCutoff[T: Encoder, K: Encoder, V](
      ds: Dataset[T], keyOf: T => K, valueOf: T => V): Dataset[T] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[T, T](OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          val out = Seq.newBuilder[T]
          var prev = state.getOption
          rows.foreach { r =>
            if (!prev.exists(p => valueOf(p) == valueOf(r))) { out += r; prev = Some(r) }
          }
          prev.foreach(state.update)
          out.result().iterator
      }

  /** Streaming exact dedup: first occurrence of each content fingerprint
    * passes, later duplicates are dropped — the continuous twin of
    * `ext.Dedup.exactDedupStats`' survivor selection. State = one entry per
    * distinct fingerprint, partitioned by the dedup key (RocksDB at
    * scale). Unbounded retention: use [[streamingDedupBounded]] when a
    * lateness horizon applies. */
  def streamingDedup(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", md5(col(textCol))).dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: duplicates are only suppressed
    * within the lateness horizon, so state is dropped once the watermark
    * passes — the 100 TB-curation shape (state size is bounded by the
    * horizon, not the corpus). */
  def streamingDedupBounded(docs: DataFrame, textCol: String, tsCol: String,
      lateness: String): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming curation filter: the ext quality/language scores are pure
    * Column expressions, so they run unchanged on a stream — map-only,
    * stateless, full codegen. */
  def streamingQualityFilter(docs: DataFrame, textCol: String,
      minQuality: Double): DataFrame = {
    val t = graft.ext.TextAnalysis
    docs.withColumn("quality",
        t.qualityScore(col(textCol), t.tokenCount(col(textCol))))
      .where(col("quality") >= minQuality)
  }

  /** Event-time timer via `GroupState` timeouts (E7 as a continuous
    * operator): for each key, emit a wakeup record when no event arrives for
    * `timeoutMs` — the TimerManager pattern on streaming state. */
  def streamingTimer[T: Encoder, K: Encoder](
      ds: Dataset[T], keyOf: T => K, timeoutMs: Long)(
      onTimeout: K => T): Dataset[T] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[Long, T](OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (k: K, rows: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(onTimeout(k))
          } else {
            val n = rows.size
            state.update(state.getOption.getOrElse(0L) + n)
            state.setTimeoutDuration(timeoutMs)
            Iterator.empty
          }
      }
  }
}
