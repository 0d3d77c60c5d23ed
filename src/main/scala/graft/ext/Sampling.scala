package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-splitting operators for training-data
  * pipelines (SURVEY.md §2.4 extension set).
  *
  * Everything keys off a PORTABLE content hash (md5-derived 60-bit int —
  * the same construction [[TextAnalysis.simhash16]] uses), not Spark's
  * `rand()` or `xxhash64`: the assignment of a row to a split/sample is a
  * pure function of its id, so it is reproducible across engines (DuckDB
  * oracle included), across runs, and across cluster sizes — the property
  * a training pipeline needs so that train/val/test membership never
  * drifts when data is re-partitioned or re-processed. Map-only (no
  * shuffle) until the final stats rollup.
  */
object Sampling {

  /** Portable 60-bit hash of a column's string form: identical in Spark and
    * DuckDB (`CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)`). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic fraction-based sample: keeps a row iff
    * hash(id) mod denom < num. */
  def deterministicSample(df: DataFrame, idCol: String, num: Int, denom: Int): DataFrame =
    df.where(pmod(portableHash(col(idCol)), lit(denom)) < num)

  /** Train/val/test split assignment from hash buckets out of 100:
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val,
    * rest -> test. */
  def splitColumn(idCol: Column, trainPct: Int, valPct: Int): Column = {
    val bucket = pmod(portableHash(idCol), lit(100))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Per-(source, split) corpus stats — the audit table a dataset release
    * ships with. */
  def splitStats(docs: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame =
    docs
      .withColumn("split", splitColumn(col(idCol), trainPct, valPct))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("tokens"),
        min(col(idCol)).as("first_doc"))
}
