package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stage conversion funnel over an event stream — the product-analytics
  * primitive (did the user reach stage B within a window of first reaching
  * stage A, and how fast?). Engine-time convention: `ts` is Long nanos.
  *
  * Scale design: the stage-A anchor is one map-side-combinable min
  * aggregate; the stage-B attach is an equi-join on user_id with the
  * window bounds as join predicates (shuffle by user, per-user groups
  * bounded by that user's events — no window function, no all-events
  * sort); the time-to-convert min is again partial-agg'd. At 100 TB of
  * events everything partitions by user_id. */
object EventFunnel {

  /** One row per user who reached `startType`: (user_id, s_ts = first
    * start-event nanos, converted, ttc_ns = min nanos from start to a
    * `convType` event inside (s_ts, s_ts + windowNs], null when none). */
  def conversionFunnel(events: DataFrame, startType: String, convType: String,
      windowNs: Long): DataFrame = {
    require(windowNs > 0, "window must be positive")
    val starts = events.where(col("event_type") === startType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val convs = events.where(col("event_type") === convType)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    starts.join(convs,
        col("user_id") === col("c_user") && col("c_ts") > col("s_ts") &&
          col("c_ts") <= col("s_ts") + windowNs, "left")
      .groupBy(col("user_id"), col("s_ts"))
      .agg(min(col("c_ts") - col("s_ts")).as("ttc_ns"))
      .select(col("user_id"), col("s_ts"),
        col("ttc_ns").isNotNull.as("converted"), col("ttc_ns"))
  }

  /** N-stage ordered funnel: anchor at the user's FIRST `stages(0)` event,
    * then for each later stage the earliest event of that type strictly
    * after the previous stage's time, all within `windowNs` of the anchor.
    * One output row per anchored user: (user_id, t1..tN nullable stage
    * nanos, stages_reached incl. the anchor). Nulls cascade — a user who
    * never reached stage i has t_i..t_N null.
    *
    * Same scale shape as [[conversionFunnel]], once per stage: the
    * attach is an equi-join on user_id with the time bounds in the join
    * predicate (no window function, no global sort), and each stage's min
    * is partial-aggregated. N-1 user-keyed shuffles total; at 100 TB all
    * of them co-partition on user_id, so AQE collapses them into one
    * exchange lineage. */
  def stagedFunnel(events: DataFrame, stages: Seq[String],
      windowNs: Long): DataFrame = {
    require(stages.size >= 2, "need at least 2 stages")
    require(windowNs > 0, "window must be positive")
    var cur = events.where(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    stages.zipWithIndex.tail.foreach { case (st, i) =>
      val ev = events.where(col("event_type") === st)
        .select(col("user_id").as("u"), col("ts").as("ets"))
      cur = cur.join(ev,
          col("user_id") === col("u") && col("ets") > col(s"t$i") &&
            col("ets") <= col("t1") + windowNs, "left")
        .groupBy(cur.columns.map(col): _*)
        .agg(min(col("ets")).as(s"t${i + 1}"))
    }
    cur.withColumn("stages_reached",
      (2 to stages.size).map(i =>
        when(col(s"t$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _) + 1)
  }

  /** Hourly burst detection per event type: an hour is a burst when its
    * event rate exceeds `factor`× the trailing-24h mean —
    * n·24 > trail·factor in pure integers (cross-multiplied, no division,
    * no floats). The trailing sum is a RANGE window over hour VALUES
    * (24 PRECEDING..1 PRECEDING), so hours with zero events — absent from
    * the counts frame — still shorten the baseline correctly; the first
    * 24 hours of each type never flag (no full baseline yet).
    *
    * Scale shape: one (type, hour) partial-agg count, then windows
    * partitioned by type over hour-count rows — state is hours×types, not
    * events. The rate-anomaly monitor for ingest pipelines. */
  def hourlyBursts(events: DataFrame, epochNs: Long, factor: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(factor >= 1, "factor must be positive")
    val counts = events
      .select(col("event_type"), expr(s"(ts - ${epochNs}L) div 3600000000000L").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-24, -1)
    counts
      .withColumn("trail", coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("first_hr", min(col("hr")).over(Window.partitionBy(col("event_type"))))
      .withColumn("burst",
        col("hr") >= col("first_hr") + 24 && col("n") * 24 > col("trail") * factor)
      .select(col("event_type"), col("hr"), col("n"), col("trail"), col("burst"))
  }

  /** SCD-type-2 interval compaction (change-data-capture history build):
    * collapse each key's event sequence into validity intervals of its
    * tracked attribute — one row per maximal run of consecutive equal
    * values. Returns (user_id, event_type, valid_from, valid_to, n_events,
    * is_current): `valid_from` = first event nanos of the run, `valid_to` =
    * start of the NEXT run (null on the open, current run).
    *
    * The islands construction: a run boundary is `attr != lag(attr)`; the
    * running sum of boundary flags numbers the islands; one groupBy
    * collapses each island; a second window attaches the successor's start.
    * Both windows partition by the key and the island agg is a plain
    * hash aggregate — nothing global, per-key group size is that key's
    * event count, so the op scales horizontally over user_id exactly like
    * [[conversionFunnel]]. Ties in ts break on event_id (unique), making
    * the compaction deterministic under any partitioning.
    *
    * Training-data use: entity-state history tables (user plan, document
    * license, crawl status) distilled from append-only logs — the "latest
    * consistent snapshot + full history" input that incremental curation
    * (license filtering, takedown audits) joins against. */
  def scdIntervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("island", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col("user_id"), col("island"))
      .agg(first(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wi = Window.partitionBy(col("user_id")).orderBy(col("island"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"), col("valid_to").isNull.as("is_current"))
  }
}
