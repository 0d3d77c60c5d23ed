package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located join path for repeated big-big
  * joins at cluster scale. Writing both sides bucketed (and sorted) by the
  * join key lets every subsequent join run with ZERO exchange — each task
  * reads matching buckets from both tables. This is the standard answer to
  * "this fact-fact join shuffles 100 TB every night": pay the shuffle once
  * at write time, never again at read time.
  *
  * Spark only honours bucketing through the catalog (`saveAsTable`), not
  * plain `parquet(path)` — hence the table-name API. Reference context:
  * beavers replays from raw parquet each run (`pyarrow_replay.py`); this is
  * the Spark-native upgrade for the repeated-join workloads it feeds.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. `buckets`
    * should match downstream `spark.sql.shuffle.partitions` (or a divisor)
    * so joins and aggregations line up with the file layout. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two equally-bucketed tables on their bucket key. With both sides
    * bucketed `buckets`-way on `key`, the physical plan contains no
    * Exchange — assert via `coLocatedJoinIsShuffleFree`. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the executed plan for a join of the two bucketed tables has
    * no shuffle (the property the layout exists to guarantee). Broadcast is
    * disabled for the check: a broadcast join also avoids the shuffle but
    * only because the test tables are small — the bucketed layout is what
    * guarantees it when BOTH sides are too big to broadcast. */
  def coLocatedJoinIsShuffleFree(spark: SparkSession, left: String,
      right: String, key: String): Boolean = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = bucketedJoin(spark, left, right, key)
        .queryExecution.executedPlan.toString
      !plan.contains("Exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
