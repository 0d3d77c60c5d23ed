package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline the
  * engine exists for at 100 TB: language filter -> quality filter -> exact
  * dedup -> near-dup removal -> per-source stats. Every stage is one of the
  * §2.4 operators; stages stay declarative so Catalyst fuses the filters
  * into the scan and the only shuffles are the dedup keys, the LSH bucket
  * join and the final rollup.
  */
object Curation {

  /** The demo linear-model weights shared by q122 (inference) and the
    * q278/q279 evaluation queries (AUC, calibration) — integer weights so
    * every margin is bit-exact across engines. Order is fixed: the oracle
    * interpolates these as a VALUES table. */
  val DemoWeights: Seq[(String, Long)] = Seq(
    "fast" -> 3L, "merge" -> 2L, "vector" -> 2L, "stream" -> 2L,
    "query" -> 1L, "table" -> 1L, "hash" -> 1L, "key" -> 1L,
    "slow" -> -4L, "scan" -> -2L, "row" -> -1L, "a" -> -1L,
    "big" -> -2L, "the" -> 1L, "spark" -> 2L)
  val DemoBias: Long = -2L

  /** `WITH`-fragment SQL for [[DemoWeights]] as a VALUES table. */
  def demoWeightsValuesSql: String =
    DemoWeights.map { case (t, w) => s"('$t', $w)" }.mkString(", ")

  /** Deterministic near-dup survivor rule: a doc is dropped iff it is the
    * higher id of SOME qualifying pair (keep-the-oldest policy). */
  def removeNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", threshold)
    docs.join(pairs.select(col("b_id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Curate: keep docs that look English, clear the quality bar, survive
    * exact dedup (min doc_id per text) and near-dup removal; report
    * per-source corpus stats. */
  def curate(docs: DataFrame, minQuality: Double, nearDupThreshold: Double): DataFrame = {
    val scored = docs
      .withColumn("lang_pred",
        TextAnalysis.langPred(TextAnalysis.stopwordRatio(col("text"))))
      .withColumn("quality",
        TextAnalysis.qualityScore(col("text"), TextAnalysis.tokenCount(col("text"))))
    val filtered = scored
      .where(col("lang_pred") === "en" && col("quality") >= minQuality)
    // exact dedup: survivor = min doc_id per identical text
    val exactKept = filtered.join(
      filtered.groupBy(col("text").as("t_key")).agg(min(col("doc_id")).as("doc_id")),
      Seq("doc_id"), "left_semi")
    val kept = removeNearDups(exactKept, nearDupThreshold)
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("kept_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("kept_tokens"),
        min(col("doc_id")).as("first_doc"))
  }

  /** Linear (fastText-style) quality-classifier INFERENCE: integer token
    * weights + bias, margin = bias + Σ weight(token) over the doc's tokens
    * (with multiplicity), keep iff margin > 0. This is the quality-filter
    * shape modern curation stacks run at corpus scale (a trained linear
    * model over bag-of-words features); weights here are MODEL STATE —
    * kilobytes for real vocabularies — carried as a literal map column, so
    * scoring is one map-only pass with zero shuffles and zero joins (the
    * fold is O(|vocab_entry_scan|) per token on a literal map; at real
    * 50k-token vocabularies swap the literal for a broadcast join on an
    * exploded token frame — same semantics, same integer margin).
    * All-integer arithmetic keeps every keep decision bit-exact across
    * engines (the oracle re-derives margins with a VALUES weight table). */
  def linearGate(docs: DataFrame, textCol: String, idCol: String,
      weights: Map[String, Long], bias: Long): DataFrame = {
    val wmap = typedLit(weights)
    // hoist the token array into a named column (interpreted-HOF rule:
    // never re-split per element)
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"),
        (lit(bias) + aggregate(col("toks"), lit(0L),
          (acc, t) => acc + coalesce(element_at(wmap, t), lit(0L)))).as("margin"))
      .withColumn("keep", col("margin") > 0)
  }

  /** JVM mirror of [[linearGate]]'s margin for per-row streaming state
    * code — same tokenization (`split(" ", -1)` == Spark `split` on a
    * space), same integer sum. Pinned equal to the Column form in
    * `TransformWithStateSpec`. */
  def linearMarginJvm(text: String, weights: Map[String, Long], bias: Long): Long = {
    var m = bias
    text.split(" ", -1).foreach(t => m += weights.getOrElse(t, 0L))
    m
  }

  /** CCNet's actual keep rule composed from this engine's operators:
    * score every doc with the unigram-LM surprisal
    * ([[TextAnalysis.unigramSurprisal]]) and keep, PER SOURCE, the middle
    * of the distribution — docs between the loPct and hiPct surprisal
    * quantiles (head = boilerplate/template mass, tail = rare-token
    * noise). Quantiles run on an INTEGER surprisal grid:
    * bin = (bits_q4·64) div (4·n) is 1/16-bit resolution in pure integer
    * division, then the same ceil-rank extraction as
    * [[Histogram.gridQuantiles]] — so the cut, and hence every keep
    * decision, is bit-exact across engines (absolute-threshold banding in
    * `unigramSurprisal.band` is corpus-size sensitive; this quantile form
    * is the production shape).
    *
    * Scale: the surprisal stages as in [[TextAnalysis.unigramSurprisal]];
    * the quantile pass is one (source, bin) aggregate — per-source state
    * is the occupied-bin count, never the doc count — and the per-source
    * cut table is tiny (broadcast back). */
  def surprisalBandFilter(docs: DataFrame, textCol: String, idCol: String,
      srcCol: String, loPct: Int = 25, hiPct: Int = 75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = TextAnalysis.unigramSurprisal(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")), "doc_id")
      .withColumn("bin", expr("(bits_q4 * 64) div (n_tokens * 4)"))
    val byBin = Window.partitionBy(col("source")).orderBy(col("bin"))
    val whole = Window.partitionBy(col("source"))
    val cum = s.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byBin))
      .withColumn("n", sum(col("cnt")).over(whole))
    val cuts = cum.groupBy(col("source")).agg(
      min(when(col("cum") >= expr(s"(n * $loPct + 99) div 100"), col("bin"))).as("b_lo"),
      min(when(col("cum") >= expr(s"(n * $hiPct + 99) div 100"), col("bin"))).as("b_hi"))
    s.join(broadcast(cuts), "source")
      .select(col("doc_id"), col("source"), col("bin"),
        col("bin").between(col("b_lo"), col("b_hi")).as("keep"))
  }

  /** Eval-set DECONTAMINATION report — the pre-training step that screens
    * the corpus against held-out benchmarks before anything trains on it:
    * for every corpus doc, how many of its distinct k-gram shingles appear
    * anywhere in the eval set, the overlap fraction in integer ppm, and
    * the contamination flag at `thresholdPpm`. The n-gram-overlap rule is
    * the standard published decontamination scheme (exact-match n-grams
    * against benchmark text), here at the same shingle granularity as the
    * dedup family so one gram representation serves both.
    *
    * 100 TB shape: grams hash to int64 BEFORE any join ([[Dedup.
    * hashedShingleSets]] — gram strings never shuffle), the eval side is
    * benchmark-sized (thousands of docs, not corpus-sized) so its distinct
    * gram set BROADCASTS — the probe is a map-side broadcast hash join on
    * the exploded corpus grams with no corpus shuffle, and the per-doc
    * rollup's exchange moves one partial row per (doc, partition) thanks
    * to partial aggregation (a doc's grams are co-located by explode).
    * Docs with fewer than k tokens carry no grams and are out of scope,
    * matching the dedup family's convention. */
  def evalContamination(corpus: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, k: Int = 3,
      thresholdPpm: Long = 500000L): DataFrame = {
    val evalGrams = Dedup.hashedShingleSets(evalDocs, textCol, idCol, k)
      .select(explode(col("s")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    Dedup.hashedShingleSets(corpus, textCol, idCol, k)
      .select(col("doc_id"), explode(col("s")).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("overlap_ppm", expr("(n_hit * 1000000) div n_grams"))
      .withColumn("contaminated", col("overlap_ppm") >= lit(thresholdPpm))
  }

  /** JVM mirror of the k-gram int64 hashing the batch [[evalContamination]]
    * path computes with Columns (split -> k-gram concat -> xxhash64 seed
    * 42): the same token split (trailing empties kept), the same space
    * joining, the same hash function via Spark's own `XxHash64Function` —
    * pinned equal to the Column path in `TransformWithStateSpec` so the
    * streaming gate and the batch report count the same grams. */
  def gramHashesJvm(text: String, k: Int): Set[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k) Set.empty
    else (0 to toks.length - k).iterator.map { i =>
      val g = toks.slice(i, i + k).mkString(" ")
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(g),
        org.apache.spark.sql.types.StringType, 42L)
    }.toSet
  }

  /** Per-doc contamination decision in JVM terms: `(n_grams, n_hit,
    * contaminated)`, or None for docs with fewer than k tokens (out of
    * scope, same convention as the batch operator). */
  def contaminationJvm(text: String, evalGrams: Set[Long], k: Int,
      thresholdPpm: Long): Option[(Long, Long, Boolean)] = {
    val gs = gramHashesJvm(text, k)
    if (gs.isEmpty) None
    else {
      val hits = gs.count(evalGrams.contains).toLong
      Some((gs.size.toLong, hits, hits * 1000000L / gs.size >= thresholdPpm))
    }
  }

  /** The composed pretraining-curation FUNNEL with per-stage attrition
    * accounting — the report a data team actually reviews: for every
    * source, how many docs each gate dropped (Gopher heuristics
    * [[TextAnalysis.gopherRules]], CCNet surprisal band
    * [[surprisalBandFilter]], exact dedup) and the final doc/token yield.
    * Gates are evaluated independently on the full corpus (so attrition
    * attribution is stable), dedup runs on the doubly-kept pool with the
    * min-id survivor rule. Every stage is one of the §2.4 operators;
    * everything stays declarative — the two gate frames join back by
    * doc id and the summary is one per-source aggregate. */
  def curationFunnel(docs: DataFrame, textCol: String, idCol: String,
      srcCol: String): DataFrame = {
    val gopher = TextAnalysis.gopherRules(docs, textCol, idCol)
      .select(col("doc_id"), col("keep").as("g_keep"))
    val band = surprisalBandFilter(docs, textCol, idCol, srcCol)
      .select(col("doc_id"), col("keep").as("b_keep"))
    // pinned-cached: the gate pipelines (notably the surprisal subtree
    // inside `band`) feed gates, pool, and the dedup self-join — without
    // the cache the whole scoring pipeline re-executes per consumer.
    // PinnedCache scopes the blocks: long-lived sessions release via
    // PinnedCache.releaseAll() between pipeline invocations.
    val staged = PinnedCache.pin(docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        col(textCol).as("text"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .join(gopher, "doc_id")
      .join(band, "doc_id"))
    val pool = PinnedCache.pin(staged.where(col("g_keep") && col("b_keep")))
    val poolFlag = pool
      .join(pool.groupBy(col("text").as("t")).agg(min(col("doc_id")).as("keep_id")),
        col("text") === col("t"))
      .withColumn("is_surv", col("doc_id") === col("keep_id"))
    val gates = staged.groupBy(col("source")).agg(
      count(lit(1)).as("total_docs"),
      sum(when(!col("g_keep"), 1L).otherwise(0L)).as("dropped_gopher"),
      sum(when(col("g_keep") && !col("b_keep"), 1L).otherwise(0L)).as("dropped_band"))
    val yields = poolFlag.groupBy(col("source")).agg(
      count(lit(1)).as("pool_docs"),
      sum(when(col("is_surv"), 1L).otherwise(0L)).as("kept_docs"),
      sum(when(col("is_surv"), col("n_tok")).otherwise(0L)).as("kept_tokens"))
    gates.join(yields, Seq("source"), "left_outer")
      .na.fill(0L, Seq("pool_docs", "kept_docs", "kept_tokens"))
      .select(col("source"), col("total_docs"), col("dropped_gopher"),
        col("dropped_band"),
        (col("pool_docs") - col("kept_docs")).as("dropped_dup"),
        col("kept_docs"), col("kept_tokens"))
  }
}
