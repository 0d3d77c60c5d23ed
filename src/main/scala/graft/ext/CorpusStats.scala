package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus distribution statistics for training-data pipelines: exact
  * per-group quantiles of a measure column (token counts, doc lengths).
  *
  * EXACT discrete quantiles via rank positions — the value at row
  * `ceil(p * n)` of the group's sort order. All decisions are integer
  * (rank vs ceil of a double both engines compute identically), so results
  * are bit-exact against the DuckDB oracle — unlike interpolating
  * `percentile_cont` implementations, whose last-ulp arithmetic differs
  * across engines.
  *
  * Scale: one shuffle keyed by group carrying only (group, long value);
  * per-group sort. For 100 TB with huge groups, `approx_percentile`
  * (t-digest, map-side combinable) is the cheaper drop-in when exactness
  * isn't required; this operator is the exact reference semantics.
  */
object CorpusStats {

  /** One row per group: n plus the exact p-quantiles of `valueCol`
    * (discrete, value at rank ceil(p*n)), output columns `p{percent}`. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: Column,
      ps: Seq[Double]): DataFrame = {
    val base = df.select(col(groupCol), valueCol.cast("long").as("v"))
    val w = Window.partitionBy(groupCol).orderBy(col("v"))
    val ranked = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(groupCol)))
    ranked
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        ps.map { p =>
          max(when(col("rn") === ceil(lit(p) * col("n")), col("v")))
            .as(s"p${(p * 100).round}")
        }: _*)
  }
}
