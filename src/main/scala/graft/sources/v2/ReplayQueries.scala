package graft.sources.v2

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.QueryDef

/** Oracle-backed query exercising the graft-replay DataSourceV2 connector
  * end-to-end: a one-week cursor slice (literal ts bounds pushed into the
  * scan for row-group pruning) aggregated to hourly buckets. The oracle
  * reads the same parquet directly — proving the connector's row
  * materialization (projection, nulls, ns-timestamps-as-long) is exact. */
object ReplayQueries {

  /** Exact decimal sum surfaced as double (the Relational.dsum pattern):
    * deterministic under any partition/summation order. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // (2024-01-08, 2024-01-15] in epoch nanos — inside the events range at
  // every scale factor (generation always spans 2024-01-01..2024-01-30).
  private val FromNs = 1704672000L * 1000000000L
  private val ToNs = 1705276800L * 1000000000L

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "q81_v2_replay_hourly",
      (s, dir) => s.read.format("graft-replay").option("tsCol", "ts")
        .load(s"$dir/events.parquet")
        .where(col("ts") > FromNs && col("ts") <= ToNs)
        .groupBy(expr("(ts div 3600000000000) * 3600").as("bucket_start"))
        .agg(count(lit(1)).as("event_cnt"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket_start")),
      Some(s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start,
              |  COUNT(*) AS event_cnt,
              |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              |FROM events
              |WHERE epoch_ns(ts) > ${FromNs} AND epoch_ns(ts) <= ${ToNs}
              |GROUP BY 1 ORDER BY bucket_start""".stripMargin),
    ),

    // V2 aggregate pushdown: ungrouped COUNT(*)/MIN(ts)/MAX(ts) answered
    // ENTIRELY from the cached row-group footer index — the executed plan
    // is a bare Project over a single-row metadata-only BatchScan (no
    // aggregate exec, zero data pages read; ReplaySourceSpec +
    // PlanSpec pin the shape). The "how big is the log, what span does
    // it cover" probe every replay driver issues, at footer cost.
    QueryDef(
      "q213_v2_agg_pushdown",
      (s, dir) => s.read.format("graft-replay").option("tsCol", "ts")
        .load(s"$dir/events.parquet")
        .agg(count(lit(1)).as("n_rows"), min(col("ts")).as("min_ts"),
          max(col("ts")).as("max_ts")),
      Some("""SELECT COUNT(*) AS n_rows, MIN(epoch_ns(ts)) AS min_ts,
             |  MAX(epoch_ns(ts)) AS max_ts FROM events""".stripMargin),
    ),
  )
}
