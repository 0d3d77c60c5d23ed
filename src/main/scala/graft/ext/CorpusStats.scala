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

  /** Per-token document frequency: (w, df) — in how many docs each token
    * appears. One explode + one (token)-keyed distinct+count. */
  def tokenDocFrequency(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Lexical commonness: per doc, the average corpus document-frequency of
    * its tokens (every occurrence counts) — low values flag rare-token /
    * jargon / garbage docs, the rational-arithmetic cousin of a unigram
    * surprisal score (no transcendentals, so bit-exact cross-engine).
    *
    * Scale shape: the classic TF-DF pattern — one token-keyed shuffle to
    * build df, one token-keyed join (df side is vocabulary-sized; broadcast
    * when it fits), one doc-keyed aggregate of longs. */
  def commonnessScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val total = docs.count()
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    tok
      .join(tokenDocFrequency(docs, textCol, idCol), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("df")).as("df_sum"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("df_sum"), col("n_tokens"),
        (col("df_sum").cast("double") / (col("n_tokens") * total)).as("commonness"))
  }

  /** Per-doc lexical diversity: type-token ratio (distinct/total tokens)
    * and hapax ratio (tokens occurring exactly once / total) — low TTR
    * flags repetitive text, high hapax flags noise/gibberish. Integer
    * rationals via one (doc, token)-keyed count + one doc-keyed rollup. */
  def lexicalDiversity(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_tokens")).as("hapax_ratio"))

  /** Per-doc out-of-vocabulary rate against a frequency-derived vocabulary
    * (tokens with corpus count >= `minCount`): the cheap tokenizer-coverage
    * signal — docs full of OOV tokens are noise, wrong-language, or will
    * fragment into long byte sequences under a real tokenizer.
    *
    * Scale shape: vocabulary is a corpus-frequency aggregate (one
    * token-keyed shuffle, vocabulary-sized output) BROADCAST into a
    * map-side membership probe of the exploded token stream; the only
    * other shuffle is the doc-keyed rollup of long counts. Integer
    * rationals — bit-exact cross-engine. */
  def oovRate(docs: DataFrame, textCol: String, idCol: String,
      minCount: Long): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount).select(col("w"), lit(1).as("in_vocab"))
    tok
      .join(broadcast(vocab), Seq("w"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

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

  /** Robust per-source length outliers via MAD (median absolute
    * deviation): a doc is an outlier when |x − median| exceeds
    * 3·1.4826·MAD, tested as the cross-multiplied INTEGER inequality
    * dev·10^4 > MAD·44478 — no floats, bit-exact cross-engine. Median
    * and MAD both use [[exactQuantiles]]' discrete convention (value at
    * rank ceil(n/2)), so the whole statistic is integer end to end.
    * Unlike mean/stddev z-scores, the MAD gate itself is immune to the
    * outliers it hunts — the standard robust screen for length-based
    * corpus anomalies (truncated docs, concatenation bugs, spam walls).
    *
    * Three source-partitioned passes (median rank, deviation median
    * rank, flag count) — each a per-group sort of (source, long) pairs,
    * nothing global. Returns (source, n_docs, med, mad, n_outliers). */
  def madOutliers(docs: DataFrame, textCol: String, srcCol: String,
      thrBp: Long = 44478L): DataFrame = {
    val base = PinnedCache.pin(docs.select(col(srcCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("x")))
    val med = exactQuantiles(base, "source", col("x"), Seq(0.5))
      .select(col("source"), col("p50").as("med"))
    val withDev = PinnedCache.pin(base.join(med, "source")
      .withColumn("dev", abs(col("x") - col("med"))))
    val mad = exactQuantiles(withDev, "source", col("dev"), Seq(0.5))
      .select(col("source"), col("p50").as("mad"))
    withDev.join(mad, "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") * 10000 > col("mad") * thrBp, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Winsorized per-source mean length: clamp every doc's token count to
    * its source's exact discrete [p10, p90] before averaging — the robust
    * central-tendency companion to [[madOutliers]] (that flags tails;
    * this reports a mean the tails cannot drag). Mean emitted as integer
    * ppm (clamped sum ·10^6 div n) — no float accumulation. Same
    * source-partitioned rank-window shape as [[exactQuantiles]]. */
  def winsorizedMean(docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val base = PinnedCache.pin(docs.select(col(srcCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("x")))
    val cuts = exactQuantiles(base, "source", col("x"), Seq(0.1, 0.9))
      .select(col("source"), col("p10"), col("p90"))
    base.join(cuts, "source")
      .withColumn("w", greatest(col("p10"), least(col("p90"), col("x"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("p10")).as("p10"),
        max(col("p90")).as("p90"), sum(col("w")).as("wsum"))
      .withColumn("wmean_ppm", expr("(wsum * 1000000) div n_docs"))
  }

  /** Pairwise EXACT Jaccard similarity between corpus sources over their
    * distinct k-shingle sets — the crawl-overlap matrix a dedup pipeline
    * consults BEFORE the doc-level pass (which source pairs duplicate each
    * other decides what to dedup against what, and in which order).
    * Returns the complete upper-triangle matrix (src_a < src_b), zero
    * intersections included: (src_a, src_b, n_a, n_b, inter, jaccard_ppm)
    * with jaccard_ppm = floor(10^6 · |A∩B| / |A∪B|) — integer, engine-
    * portable.
    *
    * Scale shape: per-source distinct gram sets come from one map-side
    * shingle pass + one (source, gram)-keyed distinct — grams are int64
    * hashes, never strings, on the shuffle ([[Dedup.hashedShingleSets]]).
    * Intersections are a gram-keyed self-join: per-gram cost is
    * (#sources sharing the gram)², bounded by S² per gram with S = source
    * count — fine while S is organizationally small (hundreds). The
    * S-only frames (sizes, the pair skeleton) are metadata-sized. For
    * S in the millions (per-HOST matrices), swap the exact sets for
    * per-source KMV sketches ([[Sketches]], q93's mergeability) and keep
    * this exact operator for the shortlisted pairs. */
  def sourceSimilarityMatrix(docs: DataFrame, textCol: String, srcCol: String,
      k: Int = 3): DataFrame = {
    val g = PinnedCache.pin(
      Dedup.hashedShingleSets(docs, textCol, srcCol, k)
        .select(col("doc_id").as("source"), explode(col("s")).as("h"))
        .distinct())
    val sz = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val co = g.as("a")
      .join(g.as("b"), col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = sz.as("x").join(sz.as("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
    pairs.join(co, Seq("src_a", "src_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard_ppm",
        expr("(inter * 1000000) div (n_a + n_b - inter)"))
  }

  /** Vocabulary growth curve per source — the Heaps-law saturation audit:
    * at checkpoints of every `step` docs (in deterministic doc-id order),
    * how many tokens and how many DISTINCT token types the source has
    * accumulated. A flattening types curve says more crawl from that
    * source buys no new vocabulary (diminishing data value); a
    * still-linear curve says the source is far from mined out. Returns
    * (source, checkpoint, docs_seen, tokens_seen, vocab_seen), one row
    * per occupied step bucket, checkpoint = the last doc rank in the
    * bucket.
    *
    * Scale shape: ranks are a per-source window (doc-count rows of
    * (id, n_tok) longs, never text); type novelty reduces to ONE
    * (source, token)-keyed min-rank aggregate — first occurrence is a
    * min, so no per-checkpoint distinct counting and no token multiset
    * re-scans; the cumulative sums then run over source x buckets rows —
    * metadata-sized (the Histogram.gridBins state-bound argument). */
  def vocabGrowth(docs: DataFrame, textCol: String, srcCol: String,
      idCol: String, step: Int): DataFrame = {
    require(step >= 1, "step must be positive")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val ranked = PinnedCache.pin(docs
      .select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_tok", size(col("toks")).cast("long")))
    val bkt = expr(s"(rnk + $step - 1) div $step")
    val perBucket = ranked.groupBy(col("source"), bkt.as("bkt"))
      .agg(max(col("rnk")).as("docs_partial"), sum(col("n_tok")).as("tok_partial"))
    val firstRank = ranked
      .select(col("source"), col("rnk"), explode(col("toks")).as("w"))
      .groupBy(col("source"), col("w")).agg(min(col("rnk")).as("fr"))
    val newTypes = firstRank
      .groupBy(col("source"), expr(s"(fr + $step - 1) div $step").as("bkt"))
      .agg(count(lit(1)).as("new_types"))
    val byBkt = Window.partitionBy(col("source")).orderBy(col("bkt"))
    perBucket
      // every occupied first-rank bucket has docs, so the left join is total
      .join(newTypes, Seq("source", "bkt"), "left_outer")
      .withColumn("nt", coalesce(col("new_types"), lit(0L)))
      .select(col("source"), (col("bkt") * step).as("checkpoint"),
        col("docs_partial").as("docs_seen"),
        sum(col("tok_partial")).over(byBkt).as("tokens_seen"),
        sum(col("nt")).over(byBkt).as("vocab_seen"))
  }

  /** Per-doc CORPUS-hapax share: the fraction of a doc's token
    * occurrences that are corpus-wide hapax legomena (count == 1 across
    * ALL docs) — the cross-document novelty/noise score, complementing
    * [[lexicalDiversity]]'s WITHIN-doc hapax ratio. High share flags
    * gibberish, OCR noise, or genuinely novel vocabulary worth keeping —
    * either way the docs a curation pass must look at. Integer ppm.
    *
    * Scale shape: one token-keyed count (vocabulary-sized), one
    * token-keyed join back (corpus-count side broadcastable under a
    * frequency floor), one doc-keyed rollup of longs. */
  def corpusHapaxShare(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = PinnedCache.pin(docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w")))
    val cc = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    tok.join(cc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_tokens"))
  }

  /** Deterministic m-out-of-n (half-sample) bootstrap CI for the per-source
    * mean token count: doc d enters resample r iff
    * portableHash(d ':' r) mod 2 = 0 — no RNG state, so the resamples are
    * reproducible across engines, runs, and partitionings (the split-column
    * discipline applied to uncertainty quantification). Returns per source
    * the full-sample mean plus the exact rank-5%/95% quantiles of the `b`
    * resample means, all integer ppm. Half-sampling is the m = n/2
    * subsample bootstrap — CI widths are conservative by ~√2 vs the n-out-
    * of-n bootstrap, the standard trade for determinism without multiset
    * draws.
    *
    * Scale shape: the explode is b× on (source, n_tok) LONGS (never text),
    * immediately crushed by a (source, r) partial agg — map-side
    * combinable; quantile extraction runs over source × b metadata rows. */
  def bootstrapMeanCI(docs: DataFrame, textCol: String, srcCol: String,
      idCol: String, b: Int = 32): DataFrame = {
    require(b >= 4 && b <= 1024, "resample count in [4,1024]")
    val base = PinnedCache.pin(docs.select(col(srcCol).as("source"),
      col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tok")))
    val res = base
      .select(col("source"), col("doc_id"), col("n_tok"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .where(pmod(Sampling.portableHash(
        concat(col("doc_id").cast("string"), lit(":"), col("r").cast("string"))),
        lit(2)) === 0)
      .groupBy(col("source"), col("r"))
      .agg(count(lit(1)).as("m"), sum(col("n_tok")).as("s"))
      .withColumn("mean_ppm", expr("(s * 1000000) div m"))
    val byMean = Window.partitionBy(col("source")).orderBy(col("mean_ppm"))
    val ranked = res
      .withColumn("rn", row_number().over(byMean).cast("long"))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy(col("source"))))
    val ci = ranked.groupBy(col("source")).agg(
      max(when(col("rn") === expr("cast(ceil(0.05 * nb) as bigint)"),
        col("mean_ppm"))).as("boot_lo_ppm"),
      max(when(col("rn") === expr("cast(ceil(0.95 * nb) as bigint)"),
        col("mean_ppm"))).as("boot_hi_ppm"),
      max(col("nb")).as("n_resamples"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("(sum(n_tok) * 1000000) div count(1)").as("mean_ppm"))
      .join(ci, "source")
  }

  /** Percentile-rank score calibration across heterogeneous sources: a
    * raw quality score is not comparable between a clean and a noisy
    * source (the same 0.6 is top-decile in one, median in the other);
    * the standard fix is each doc's WITHIN-SOURCE percentile rank —
    * rank_ppm = (rank−1)·10^6 div (n−1) with SQL rank() so ties share a
    * value (a pure function of the score multiset, no tie-break needed;
    * single-doc sources pin to 0). Downstream mixture/curation gates
    * then cut at calibrated ranks, not raw scores.
    *
    * Scale shape: scoring is map-only; the window is a per-source sort of
    * (id, score) longs — the q49 exact-quantile shape. */
  def rankNormalizeScores(docs: DataFrame, textCol: String, srcCol: String,
      idCol: String): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      TextAnalysis.qualityScore(col(textCol),
        TextAnalysis.tokenCount(col(textCol))).as("quality"))
    val bySrc = Window.partitionBy(col("source"))
    scored
      .withColumn("rk", rank().over(bySrc.orderBy(col("quality"))).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc))
      .withColumn("rank_ppm",
        expr("case when n > 1 then ((rk - 1) * 1000000) div (n - 1) else 0 end"))
      .select(col("doc_id"), col("source"), col("quality"), col("rank_ppm"))
  }
}
