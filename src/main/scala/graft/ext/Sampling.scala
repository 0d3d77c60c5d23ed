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

  /** Per-group deterministic downsampling at different rates — stratified
    * corpus rebalancing. `keepPct` maps group value -> percentage kept
    * (groups absent from the map keep 100%). Membership is the same
    * portable-hash function as [[deterministicSample]]: reproducible
    * across engines, runs, and partitionings. Map-only. */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      keepPct: Map[String, Int]): DataFrame = {
    val pct = keepPct.foldLeft(lit(100)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, p).otherwise(acc)
    }
    df.where(pmod(portableHash(col(idCol)), lit(100)) < pct)
  }

  /** Integer upsampling by per-group repeat weights — the "data mixture"
    * op (epochs-per-source): each row is replicated `weight(group)` times
    * with a `copy` index (0-based). Explode happens executor-side; output
    * size = sum(weight_g * n_g). Weights absent from the map default 1. */
  def upsample(df: DataFrame, groupCol: String, weights: Map[String, Int]): DataFrame = {
    val w = weights.foldLeft(lit(1)) { case (acc, (g, n)) =>
      when(col(groupCol) === g, n).otherwise(acc)
    }
    // weight 0 EXCLUDES the group (explode of an empty array drops the
    // row); an unguarded sequence(0, -1) would DESCEND and duplicate it
    df.withColumn("copy",
      explode(when(w > 0, sequence(lit(0), w - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic k-per-group sample: each group's k members with the
    * smallest portable content hash — "random" by hash uniformity yet a
    * pure function of the ids, so the sample is identical across engines,
    * runs, and partitionings (reservoir sampling without the order
    * dependence). The rank window runs per group; at scale swap in the
    * bounded [[graft.functions.TopKAggregator]] shape (O(k) per-group
    * traffic) — semantics identical, both deterministic. */
  def groupSample(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(portableHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(win).cast("long"))
      .where(col("rk") <= k)
  }

  /** WEIGHT-proportional deterministic sampling: keep a row with
    * probability `weight/cap` by testing `hash(id) mod cap < weight`
    * (weights above `cap` keep always). The length-weighted variant —
    * weight = token count — is the mixture-balancing primitive: sampling
    * documents proportionally to their token mass keeps the TOKEN
    * distribution representative where uniform doc sampling skews it
    * toward short docs. Same portable hash as every sampler here:
    * reproducible across engines, runs, partitionings; map-only. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      cap: Int): DataFrame =
    df.where(pmod(portableHash(col(idCol)), lit(cap)) < weight)

  /** Per-(source, split) corpus stats — the audit table a dataset release
    * ships with. */
  /** Token-budget mixture PLANNER: given a global token budget and
    * per-source target weights (ppm, summing to ~1e6), compute each
    * source's deterministic sampling rate and expected yield — the
    * planning report that precedes an actual mixture job ([[upsample]] /
    * [[stratifiedSample]] execute it; q56's shape). All integer: target
    * tokens via ppm products, rate as ppm with integer division, capped
    * at 1e6 with an `oversubscribed` flag when a source has FEWER tokens
    * than its target (the signal to upsample/epoch that source instead).
    * One per-source aggregate; the weight table is a literal map. */
  def mixturePlan(docs: DataFrame, textCol: String, srcCol: String,
      budgetTokens: Long, weightsPpm: Map[String, Long]): DataFrame =
    mixturePlanFromCounts(
      docs.select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok")),
      budgetTokens, weightsPpm)

  /** [[mixturePlan]] over PRECOMPUTED per-doc token counts
    * `(source, n_tok)` — so the budget math can ride an exact tokenizer
    * ([[Tokenize.wordpieceCounts]]) instead of the whitespace estimate,
    * or any other counting scheme, without re-deriving the planner. */
  def mixturePlanFromCounts(counts: DataFrame,
      budgetTokens: Long, weightsPpm: Map[String, Long]): DataFrame = {
    val w = typedLit(weightsPpm)
    counts
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_tok")).as("tokens"))
      .withColumn("weight_ppm", coalesce(w(col("source")), lit(0L)))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * weight_ppm) div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(target_tokens * 1000000) div tokens")))
      .withColumn("expected_tokens", expr("(tokens * rate_ppm) div 1000000"))
      .withColumn("oversubscribed", col("target_tokens") > col("tokens"))
  }

  def splitStats(docs: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame =
    docs
      .withColumn("split", splitColumn(col(idCol), trainPct, valPct))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("tokens"),
        min(col(idCol)).as("first_doc"))
}
