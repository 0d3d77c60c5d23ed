package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-skew audit + salting plan for a prospective join/aggregate key —
  * the planning query a 100 TB pipeline runs BEFORE keying a shuffle on a
  * column. Hot keys (share >= thresholdPpm of all rows) are reported with
  * the salt factor that brings their per-task row count under
  * `targetPerTask`: repartitioning on (key, hash(id) mod salt) splits the
  * hot key across `salt` tasks, the map side of the standard skew-salting
  * rewrite (AQE's skew-join handles the probe side at runtime; this audit
  * sizes the explicit variant for deterministic plans like bucketed
  * writes).
  *
  * Cost: one map-side-combinable count per key + a 1-row total broadcast —
  * strictly cheaper than any shuffle it de-risks. All arithmetic integer
  * (ppm shares, ceil-division salt), bit-exact cross-engine. */
object Skew {

  def skewAudit(df: DataFrame, keyCol: String, targetPerTask: Long,
      thresholdPpm: Long): DataFrame = {
    require(targetPerTask > 0, "targetPerTask must be positive")
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(cnt * 1000000) div total"))
      .where(col("share_ppm") >= thresholdPpm)
      .withColumn("salt", expr(s"(cnt + ${targetPerTask - 1}) div $targetPerTask"))
      .select(col("key"), col("cnt"), col("share_ppm"), col("salt"))
  }
}
