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

  /** Deterministic k-fold assignment: fold = portable-hash(id) mod k —
    * stable across runs, engines, and partitionings (the
    * [[splitColumn]] recipe with k buckets instead of named splits). */
  def foldColumn(idCol: Column, k: Int): Column =
    pmod(portableHash(idCol), lit(k.toLong))

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

  /** EXACT integer square root as a Column: floor(sqrt(n)) seeded from the
    * double sqrt, then corrected by two exact integer comparisons — double
    * rounding can land one off in either direction near perfect squares,
    * and both engines' float behavior stops mattering once the corrections
    * run (exact for any n < 2^62). */
  /** JVM replica of [[isqrt]], pinned bit-equal to the Column form
    * (JvmKernelParitySpec); used by the streaming alpha-mixture twin. */
  def isqrtJvm(n: Long): Long = {
    val s0 = math.floor(math.sqrt(n.toDouble)).toLong
    val s1 = if (s0 * s0 > n) s0 - 1 else s0
    if ((s1 + 1) * (s1 + 1) <= n) s1 + 1 else s1
  }

  def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > n, s0 - 1).otherwise(s0)
    when((s1 + 1) * (s1 + 1) <= n, s1 + 1).otherwise(s1)
  }

  /** [[isqrt]] lifted to DECIMAL(38,0) radicands (result still a long):
    * the same seed-then-correct ladder, with the two exact comparisons
    * run in decimal so s² never touches long arithmetic. Exact for any
    * n < 10²⁶: there the true root is < 10¹³, the double seed is within
    * one of it (double carries ~15.9 significant digits, so the seed's
    * absolute error is ≤ root·2.3e−16 < 0.003, plus the ±1 the floor/
    * sqrt rounding can add), and the ±1 corrections do the rest. Callers
    * above 10²⁶ must rail loudly BEFORE calling (the [[Evaluation]]
    * wilsonLowerBound discipline). */
  def isqrtDec(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val s0d = s0.cast("decimal(38,0)")
    val s1 = when(s0d * s0d > n, s0 - 1).otherwise(s0)
    val s1d = s1.cast("decimal(38,0)")
    when((s1d + lit(1)) * (s1d + lit(1)) <= n, s1 + 1).otherwise(s1)
  }

  /** JVM replica of [[isqrtDec]], pinned bit-equal to the Column form;
    * used by the streaming Wilson twin. Same n < 10²⁶ domain. */
  def isqrtDecJvm(n: BigInt): Long = {
    val s0 = math.floor(math.sqrt(n.toDouble)).toLong
    val s1 = if (BigInt(s0) * s0 > n) s0 - 1 else s0
    if (BigInt(s1 + 1) * (s1 + 1) <= n) s1 + 1 else s1
  }

  /** Temperature-scaled mixture plan (alpha = 1/2): instead of hand-picked
    * target weights, each source's weight is proportional to
    * sqrt(its token count) — the standard smoothing that upsamples small
    * sources and damps head sources (multilingual-pretraining style
    * p_i ∝ p_i^alpha at the usual alpha = 0.5). Weights derive from the
    * data IN-PLAN via [[isqrt]] (exact integer sqrt, so the whole plan
    * stays bit-exact across engines), then the q115 planner arithmetic
    * (integer ppm rates, cap at 1.0, oversubscription flags) applies
    * unchanged. The windowed total runs on the per-source aggregate —
    * a sources-sized frame, so the single-partition window is metadata
    * math, not a data shuffle (same invariant as Histogram.ksDrift). */
  def alphaMixturePlan(docs: DataFrame, textCol: String, srcCol: String,
      budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("tokens"))
      .withColumn("w_sqrt", isqrt(col("tokens")))
      .withColumn("sum_sqrt", sum(col("w_sqrt")).over(Window.partitionBy()))
      .withColumn("weight_ppm", expr("(w_sqrt * 1000000) div sum_sqrt"))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * weight_ppm) div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(target_tokens * 1000000) div tokens")))
      .withColumn("expected_tokens", expr("(tokens * rate_ppm) div 1000000"))
      .withColumn("oversubscribed", col("target_tokens") > col("tokens"))
      .drop("sum_sqrt")
  }

  def splitStats(docs: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame =
    docs
      .withColumn("split", splitColumn(col(idCol), trainPct, valPct))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("tokens"),
        min(col(idCol)).as("first_doc"))

  /** Deterministic training-order shard plan: assign every document a
    * (shard, position, token offset) for one training epoch, as a pure
    * function of (doc id, seed) — the global-shuffle replacement. A real
    * shuffle of 100 TB is a full-corpus sort; this is a map-only hash
    * assignment plus one per-shard sort, and re-shuffling for the next
    * epoch is just a new seed — no data moves until the shard writer runs.
    *
    * shard = portable_hash(id ':' seed) mod numShards; within a shard,
    * docs are ordered by (hash, id) — pseudo-random, reproducible across
    * engines/runs/partitionings (the [[portableHash]] contract);
    * `tok_offset` is the running token count before each doc, i.e. where
    * the doc starts in its packed shard file. The per-shard window is the
    * scale shape a shard writer needs anyway (one partition per output
    * shard); nothing global anywhere. */
  /** Curriculum-ordered shard plan: [[shardPlan]] with a quality-phase
    * axis — docs are bucketed into `phases` equal-count quality tiers
    * (exact equi-depth bounds over the ppm-quantized q32 score,
    * [[Layout.equiDepthBounds]]) and deterministically ordered within
    * each (phase, shard) cell by the seeded portable hash. A curriculum
    * trainer consumes phases in order; within a phase the order is an
    * unbiased reproducible shuffle; re-phasing an epoch = new seed, no
    * data movement. Returns (doc_id, q, phase, shard, pos).
    *
    * Scale: scoring + hashing are map-only; the phase cut table is
    * `phases` rows (broadcast); positions come from (phase, shard)-
    * partitioned windows — phases × shards cells, each the per-writer
    * sort the shard writer needs anyway. */
  def curriculumShardPlan(docs: DataFrame, textCol: String, idCol: String,
      phases: Int, shards: Int, seed: Int): DataFrame = {
    require(phases >= 2 && shards >= 1, "need phases >= 2, shards >= 1")
    import org.apache.spark.sql.expressions.Window
    val scored = PinnedCache.pin(docs.select(col(idCol).as("doc_id"),
      floor(TextAnalysis.qualityScore(col(textCol),
        TextAnalysis.tokenCount(col(textCol))) * 1000000).cast("long").as("q")))
    val bounds = Layout.equiDepthBounds(scored, col("q"), phases)
      .select(col("bucket").as("phase"), col("lo"), col("hi"))
    val hv = portableHash(concat(col("doc_id").cast("string"), lit(":" + seed)))
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("hv"), col("doc_id"))
    scored
      .join(broadcast(bounds), col("q") >= col("lo") && col("q") <= col("hi"))
      .withColumn("hv", hv)
      .withColumn("shard", pmod(col("hv"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("q"), col("phase"), col("shard"), col("pos"))
  }

  def shardPlan(docs: DataFrame, idCol: String, textCol: String,
      numShards: Int, seed: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val hv = portableHash(concat(col(idCol).cast("string"), lit(":" + seed)))
    val w = Window.partitionBy(col("shard")).orderBy(col("hv"), col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), hv.as("hv"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("hv"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("tok_offset",
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("tok_offset"))
  }

  /** Neyman (optimal stratified) sample allocation: given a total doc
    * budget, allocate per source ∝ N_h·σ_h — high-variance strata get
    * proportionally more samples, the design that minimizes the sampled
    * mean's variance at fixed cost. The whole computation is EXACT
    * integers: N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) by definition, so one
    * [[isqrt]] on the integer radicand gives the weight with no floats
    * anywhere; allocations are floor-div ppm shares capped at N_h.
    * Overflow bound: N_h·Σx² < 2^63 holds to ~10^9 docs × 10^3 tokens per
    * stratum; past that, pre-scale x or go decimal(38).
    *
    * Scale shape: one per-source partial agg of (count, Σx, Σx²) longs;
    * everything after runs on the sources-sized rollup (the q162
    * metadata-window argument). */
  def neymanAllocation(docs: DataFrame, textCol: String, srcCol: String,
      sampleBudget: Long): DataFrame = {
    require(sampleBudget >= 1, "sampleBudget >= 1")
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("w", isqrt(col("n_docs") * col("sxx") - col("sx") * col("sx")))
      .withColumn("sum_w", sum(col("w")).over(Window.partitionBy()))
      .withColumn("weight_ppm", expr("(w * 1000000) div sum_w"))
      .withColumn("alloc",
        least(expr(s"(${sampleBudget}L * w) div sum_w"), col("n_docs")))
      .select(col("source"), col("n_docs"), col("w"), col("weight_ppm"),
        col("alloc"))
  }

  /** Closed-loop split repair: q168's audit turned into the ACTION — any
    * test-split doc sharing a 3-gram with the train split moves to train
    * (never the reverse: train may absorb anything, test must stay
    * clean), one repair round, reported as the (split_orig, split_final)
    * migration rollup with doc and token counts. Moving a doc to train
    * can only create NEW test contamination through grams that doc
    * carries — rerunning the audit-repair loop to a fixed point is the
    * production recipe; one round is the oracle-checkable unit.
    *
    * Scale shape: the audit is [[graft.ext.Dedup.contaminatedDocs]]'
    * broadcast gram probe; the repair is a doc-keyed left join + map-side
    * CASE; the report is a 3x2-bounded rollup. */
  def repairSplitContamination(docs: DataFrame, textCol: String,
      idCol: String, trainPct: Int, valPct: Int): DataFrame = {
    val d = PinnedCache.pin(docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"),
      splitColumn(col(idCol), trainPct, valPct).as("split_orig")))
    val moved = graft.ext.Dedup.contaminatedDocs(
        d.where(col("split_orig") === "test"),
        d.where(col("split_orig") === "train"), "text", "doc_id")
      .select(col("doc_id"), lit(true).as("mv"))
    d.join(moved, Seq("doc_id"), "left_outer")
      .withColumn("split_final",
        when(col("mv").isNotNull, "train").otherwise(col("split_orig")))
      .groupBy(col("split_orig"), col("split_final"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
  }

  /** Neyman-optimal stratified sampling allocation: split a sampling
    * `budget` across strata proportionally to N_h·sigma_h (the allocation
    * minimizing the estimator variance for a fixed budget, Neyman 1934) —
    * here strata are `groupCol` groups and the audited variable is
    * `valueCol`. All integer: N_h·sigma_h = sqrt(N_h·Σy² − (Σy)²) exactly
    * (population sigma, cross-multiplied under one [[isqrt]]), and the
    * floored shares are topped up to EXACTLY `budget` by the
    * largest-remainder (Hamilton) rule with ties on the group key —
    * deterministic, no float apportionment drift. Groups with zero
    * variance still get their remainder-rank shot (N_h·sigma_h = 0 means
    * one sample suffices statistically, but the method stays total).
    *
    * Caps: n_h <= N_h (can't sample more than the stratum holds); capped
    * surplus is NOT redistributed (one-round contract, like
    * [[repairSplitContamination]] — iterate to fixed point in production).
    * Requires N_h·Σy² < 2^62 (isqrt domain; ~10^9 rows of y ~ 10^3 —
    * decimal-everywhere documented past it).
    *
    * Shape: one group rollup, windows over the GROUPS rollup only, no
    * joins. Scales. */
  def neymanAllocation(df: DataFrame, groupCol: String, valueCol: Column,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0)
    val g = df.select(col(groupCol).as("g"), valueCol.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("s1"),
        sum(col("y") * col("y")).as("s2"))
      .withColumn("w", isqrt(col("n_rows") * col("s2") - col("s1") * col("s1")))
    val tot = Window.orderBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val alloc = g
      .withColumn("w_sum", sum(col("w")).over(tot))
      .withColumn("n_floor",
        when(col("w_sum") > 0, expr(s"($budget * w) div w_sum")).otherwise(lit(0L)))
      .withColumn("rem",
        when(col("w_sum") > 0, expr(s"($budget * w) % w_sum")).otherwise(lit(0L)))
      .withColumn("floor_sum", sum(col("n_floor")).over(tot))
      .withColumn("rem_rank", row_number().over(
        Window.orderBy(col("rem").desc, col("g"))).cast("long"))
      .withColumn("n_alloc",
        col("n_floor") + when(col("rem_rank") <= lit(budget) - col("floor_sum"), 1L)
          .otherwise(0L))
    alloc.select(col("g").as(groupCol), col("n_rows"), col("w").as("n_sigma"),
      least(col("n_alloc"), col("n_rows")).as("n_alloc"),
      (col("n_alloc") > col("n_rows")).as("capped"))
  }

  /** DSIR-style importance-weighted data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document in the raw pool by its hashed-n-gram
    * log-likelihood ratio between a TARGET distribution (fit on the
    * exemplar rows `isTarget` marks — the high-quality slice you want
    * more of) and the RAW distribution (fit on the whole pool), then
    * keep the `take` highest-weighted docs. Features are unigrams hashed
    * into `buckets` bins (the paper's hashed-n-gram model — the hash IS
    * the feature map, so the vocabularies are fixed-size at any corpus
    * scale); both distributions are Laplace-smoothed.
    *
    * Weight, in [[TextAnalysis.quarterLog2]] integer quarter-bits (the
    * q105 no-libm discipline, so the statistic is bit-exact
    * cross-engine):
    *   w(doc) = Σ_tokens q4((cnt_t(b)+1)·(N_r+B)) − q4((cnt_r(b)+1)·(N_t+B))
    * — each term the quarter-bit log of p_target(b)/p_raw(b) with the
    * normalizers cross-multiplied INSIDE the log so everything stays a
    * product of longs. Selection is deterministic top-`take` by
    * (weight desc, id asc) — the paper samples Gumbel-perturbed weights;
    * the deterministic variant is the reproducible-pipeline form (rank
    * order is the contract, like [[TextAnalysis.vocabKlDrift]]).
    *
    * Shape: one token explode → bucket-keyed count (B rows, broadcast
    * back), one doc-keyed rollup, and the selection boundary as a
    * top-`take` (TakeOrderedAndProject — k rows per partition, never a
    * global sort) broadcast back as a membership flag — the heavy phase
    * is map-side-combinable counting; nothing document-sized ever
    * shuffles twice. Overflow: cnt·N < 2^63 holds to ~3·10⁹ tokens (the
    * tokenLogOdds bound); shard the counts past that. Returns ALL pool
    * rows: (doc id, n_tokens, weight_q4, selected). */
  def dsirSelection(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int, take: Int): DataFrame = {
    require(buckets >= 2 && take >= 1)
    val tok = docs.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .withColumn("b", pmod(portableHash(col("w")), lit(buckets)))
    val pinned = PinnedCache.pin(tok.select(col("doc_id"), col("is_t"), col("b")))
    val counts = pinned.groupBy(col("b")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_t"),
      count(lit(1)).as("cnt_r"))
    val totals = counts.agg(sum(col("cnt_t")).as("nt"), sum(col("cnt_r")).as("nr"))
    val scored = counts.crossJoin(broadcast(totals))
      .withColumn("term_q4",
        TextAnalysis.quarterLog2((col("cnt_t") + 1) * (col("nr") + buckets)) -
          TextAnalysis.quarterLog2((col("cnt_r") + 1) * (col("nt") + buckets)))
      .select(col("b"), col("term_q4"))
    val perDoc = PinnedCache.pin(pinned
      .join(broadcast(scored), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("term_q4")).as("weight_q4")))
    val top = perDoc
      .orderBy(col("weight_q4").desc, col("doc_id")).limit(take)
      .select(col("doc_id"), lit(true).as("sel"))
    perDoc.join(broadcast(top), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("weight_q4"),
        coalesce(col("sel"), lit(false)).as("selected"))
  }
}
