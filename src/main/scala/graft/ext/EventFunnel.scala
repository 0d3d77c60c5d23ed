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
}
