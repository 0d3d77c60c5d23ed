package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-skew audit + the explicit salting rewrites for skewed keys —
  * the planning query a 100 TB pipeline runs BEFORE keying a shuffle on a
  * column, and the deterministic rewrites it sizes (AQE's skew-join
  * handles sort-merge probe sides at runtime; the explicit variants cover
  * aggregations, bucketed writes, and plans that must stay stable).
  * SkewRehearsalSpec exercises all of this UNDER actual Zipf skew with
  * listener-asserted budgets; SCALE.md records the measured margins. */
object Skew {

  /** Hot keys (share >= thresholdPpm of all rows) with the salt factor
    * that brings their per-task row count under `targetPerTask`.
    * Cost: one map-side-combinable count per key + a 1-row total
    * broadcast — strictly cheaper than any shuffle it de-risks. All
    * arithmetic integer (ppm shares, ceil-division salt), bit-exact
    * cross-engine. */
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

  /** The standard HOT-KEY salted equi join: fact rows whose key is in
    * `hotKeys` scatter over `salt` sub-keys (hash of the whole row — any
    * assignment is correct, a deterministic one keeps reruns identical);
    * dim rows for hot keys REPLICATE `salt` times so every sub-key finds
    * its match; cold keys pass through on sub-key 0 untouched. The join
    * keys become (key, _salt), so a hot key's probe rows spread over
    * `salt` reducers instead of one — result is row-identical to the
    * plain join (each fact row still meets exactly one dim replica).
    *
    * Feed `hotKeys`/`salt` from [[skewAudit]] (hot-key sets are
    * metadata-sized by definition: a key only matters here when it holds
    * >= threshold of ALL rows, so there are at most 1e6/threshold of
    * them). Only the hot dim rows replicate — dim stays ~its own size,
    * unlike the replicate-everything variant that turns a big dim into
    * `salt` copies. Assumes dim is unique per key (the usual dimension
    * contract; duplicates would duplicate like the plain join does). */
  def saltedSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotKeys: Seq[Any], salt: Int): DataFrame = {
    require(salt >= 2, "salt must split a hot key at least in two")
    val isHotF = col(key).isin(hotKeys: _*)
    val f = fact.withColumn("_salt",
      when(isHotF, pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salt)))
        .otherwise(lit(0)))
    val isHotD = col(key).isin(hotKeys: _*)
    val d = dim
      .withColumn("_salt",
        explode(when(isHotD, sequence(lit(0), lit(salt - 1)))
          .otherwise(array(lit(0)))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Deterministic Zipf(2)-keyed synthetic frame for skew rehearsals:
    * `rows` rows with `key` ~ Zipf(exponent 2) over [1, keys] via the
    * closed-form inverse CDF of the continuous power law,
    * k = floor(1 / (1 − u·(1 − 1/K))) — key 1 takes ~50 % of all rows,
    * key 2 ~17 %, the classic hot-key shape. u comes from xxhash64(id),
    * so the frame is a pure function of (rows, keys) — reruns, engines,
    * and partitionings all see the same data. Columns:
    * (id, key, payload); `id` is the unique tiebreaker the last-by
    * contract needs. */
  def zipfFrame(spark: SparkSession, rows: Long, keys: Int): DataFrame = {
    require(keys >= 2, "need at least two keys")
    spark.range(rows)
      .withColumn("u",
        (pmod(xxhash64(col("id")), lit(1000003L)).cast("double") / 1000003.0))
      .withColumn("key",
        least(lit(keys.toLong),
          floor(lit(1.0) / (lit(1.0) - col("u") * (1.0 - 1.0 / keys))).cast("long")))
      .withColumn("payload", pmod(xxhash64(col("id"), lit(7L)), lit(1000000L)))
      .drop("u")
  }
}
