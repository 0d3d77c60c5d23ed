package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2.4): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting.
  *
  * Everything is built from codegen'd built-ins / higher-order functions —
  * no UDFs — so the operators run inside WholeStageCodegen and scale as pure
  * map work (no shuffle except final aggregates).
  *
  * Determinism: scores are rationals of ints (or products of identically
  * computed doubles), so Spark and the DuckDB oracle agree bit-for-bit.
  */
object TextAnalysis {

  /** Tiny English-stopword list used by the language-ID n-gram heuristic. */
  val EnStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Fraction of tokens that are English stopwords — the language-ID score.
    * Built from the passed Column (not a hardcoded column name) so it works
    * for any text expression. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), w => w.isInCollection(EnStopwords))) / size(tokens(text))

  /** Heuristic language ID: stopword-hit ratio thresholding. */
  def langPred(scoreCol: Column): Column =
    when(scoreCol >= 0.05, "en").when(scoreCol > 0, "mixed").otherwise("other")

  /** Composite quality score in [0,1]: length credit + stopword ratio +
    * plausible average word length. All integer-derived arithmetic. */
  def qualityScore(text: Column, nTokens: Column): Column = {
    val chars = length(text)
    val avgWordLen = (chars - (nTokens - 1)).cast("double") / nTokens
    round(
      least(nTokens / 50.0, lit(1.0)) * 0.4 +
        stopwordRatio(text) * 0.3 +
        when(avgWordLen.between(3, 8), 0.3).otherwise(0.0),
      6)
  }

  /** BPE-ish subword tokenization estimate: alpha runs, digit runs, and
    * individual non-alphanumeric symbols each count as one token — the
    * standard cheap proxy for byte-pair-encoded token counts when the real
    * tokenizer isn't available data-side. Regex runs inside codegen;
    * map-only. */
  val SubwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit(SubwordPattern), lit(0))

  def subwordTokenCount(text: Column): Column = size(subwordTokens(text))

  /** Word n-grams as space-joined strings. Guarded for short docs: fewer
    * than `n` tokens yields an empty array (an unguarded
    * `sequence(0, size-n)` would DESCEND for negative spans and then
    * out-of-range indexing throws under ANSI).
    *
    * PERFORMANCE: convenience form for ad-hoc/small inputs only. HOF
    * lambdas are interpreted — every outer expression captured in the
    * lambda body (here: the split behind `toks`) re-evaluates PER ELEMENT,
    * making this O(tokens²) per document. Corpus-scale callers must
    * project the token array into a named column and use
    * [[ngramsFromTokens]] (bound-attribute access, O(tokens)) — measured
    * 19 s -> 1 s on q47 at sf0.1. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** [[wordNgrams]] over a PRE-PROJECTED token-array column (referenced by
    * name, so lambda accesses are bound attributes — the shingleSets
    * pattern). `tokCol` must be a plain column holding `split(text, ' ')`. */
  def ngramsFromTokens(tokCol: String, n: Int): Column = expr(
    s"""case when size($tokCol) >= $n then
       |  transform(sequence(0, size($tokCol) - $n),
       |            i -> concat_ws(' ', ${(0 until n).map(j => s"$tokCol[i + $j]").mkString(", ")}))
       |else cast(array() as array<string>) end""".stripMargin)

  /** Within-document repetition: fraction of word n-grams that are
    * duplicates of an earlier one (the Gopher-style quality signal — high
    * values flag boilerplate/spam). Integer-count rational, map-only. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val g = wordNgrams(text, n)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
      .otherwise(0.0)
  }

  /** Document fingerprint: md5 of the raw text (identical in DuckDB). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical text normalization for dedup: lowercase, non-alphanumerics
    * to spaces, whitespace runs collapsed, trimmed. The standard pass
    * before exact dedup so that trivially-reformatted copies (case,
    * punctuation, spacing) hash identically. Pure codegen'd map work —
    * regex and string ops inside WholeStageCodegen, no shuffle. The regex
    * is RE2-safe (plain character classes, no backtracking constructs) and
    * evaluates identically in Spark (Java regex) and DuckDB (RE2). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** 16-bit SimHash over the distinct-token set. Per-token 64-bit hashes are
    * derived from md5 hex (portable across engines); each bit is a majority
    * vote over token hashes. Pure HOF expression — map-only at scale.
    *
    * Loop order matters for cost: the hash array is the aggregate's DATA
    * input (one pass, md5 per distinct token computed once) and the 16
    * per-bit vote counters are the accumulator — the naive per-bit outer
    * loop re-hashes every token 16 times and was the slowest operator in
    * the whole bench. Integer votes, so the result is order-independent
    * and identical to the per-bit formulation. */
  def simhash16(textCol: String): Column = simhashN(textCol, 16)

  /** N-bit SimHash (N <= 60 — the md5-derived hash provides 60 usable
    * bits). 16 bits is the compact fingerprint; 60 bits is what hamming
    * near-dup blocking needs at corpus scale — with B bands of N/B bits,
    * bucket sizes shrink exponentially in bits-per-band, so the band
    * self-join stays sparse where a 16-bit signature would degenerate into
    * huge buckets (2^4 values per band over 10^9 docs).
    *
    * Runs as the codegen'd `graft_simhash` expression (one primitive loop
    * per row inside WholeStageCodegen); [[simhashNHof]] is the interpreted
    * reference formulation the cross-check test compares against. */
  def simhashN(textCol: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")
    expr(s"graft_simhash(array_distinct(split($textCol, ' ')), $bits)")
  }

  /** floor-ish(4·log2(x)) for positive longs in PURE integer math —
    * quarter-bit log2 resolution with zero floating point, so Spark and
    * any SQL oracle produce the identical integer (the engine-wide
    * integer-grid rule applied to logarithms; a libm `log` differs by
    * ulps across engines and would break hash-exact compares).
    *
    * Construction: floor(log2 x) = length(bin(x)) - 1 exactly; quarter
    * bits come from floor(log2(x^4)). x^4 overflows past 2^15, so larger
    * x are first truncated to their top 15 bits (t = x >> (m-14), t^4 <
    * 2^60 — ANSI-safe) and the shifted-out magnitude is added back as
    * 4·(m-14). The truncation under-reads log2 by < 2^-13 — a
    * DETERMINISTIC approximation, identical wherever the formula runs.
    * Both CASE branches are lazy (Spark CaseWhen and DuckDB CASE), so the
    * small-x branch's x^4 never evaluates for large x. */
  /** JVM replica of [[quarterLog2]], pinned bit-equal to the Column form
    * (JvmKernelParitySpec) — the streaming KL twin recomputes terms
    * driver-free inside a StatefulProcessor (the BloomJoin.positionsJvm
    * discipline: one formula, two runtimes, a parity test). */
  def quarterLog2Jvm(x: Long): Long = {
    // length(bin(v)) - 1: bin() prints no leading zeros; bin(0) = "0"
    def m(v: Long): Long = if (v == 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(v)
    val mm = m(x)
    if (mm <= 14) m(x * x * x * x)
    else {
      val t = x >> (mm - 14)
      (mm - 14) * 4 + m(t * t * t * t)
    }
  }

  def quarterLog2(x: Column): Column = {
    val m = length(bin(x)) - 1
    val t = call_function("shiftright", x, m - 14)
    when(m <= 14, length(bin(x * x * x * x)) - 1)
      .otherwise((m - 14) * 4 + length(bin(t * t * t * t)) - 1)
      .cast("long")
  }

  /** Per-token log-odds ratio of the `target` source vs the rest of the
    * corpus, in [[quarterLog2]] quarter-bits — the vocabulary-shift
    * monitor (which words does this crawl/source/week over- or
    * under-use?). Laplace-smoothed:
    * lor = qlog2((cnt_a+1)·(tot_b+V)) − qlog2((cnt_b+1)·(tot_a+V)) —
    * positive = overrepresented in the target. Integer end to end: no
    * libm, bit-exact cross-engine (the q105 discipline applied to
    * relative frequency instead of surprisal).
    *
    * One token-keyed partial-agg count + a 1-row totals broadcast —
    * vocabulary-sized output, row-sized nothing. Overflow bound:
    * (cnt+1)·(tot+V) < 2^63 needs cnt·tot < 9e18 — fine to ~3e9 tokens;
    * past that, count in per-shard partials and feed
    * [[quarterLog2]] the top-15-bit truncation explicitly. */
  /** Per-source vocabulary KL divergence vs the rest of the corpus —
    * ONE drift scalar per source (the magnitude summary over
    * [[tokenLogOdds]]' per-token detail): KL(P_s ‖ P_rest) with Laplace
    * smoothing, every term in [[quarterLog2]] integer quarter-bits scaled
    * by the smoothed count — term_w = (c_w+1)·(q4((c_w+1)·N_rest) −
    * q4((r_w+1)·N_s)); `kl_mq4` normalizes by the smoothed source total
    * (milli-quarter-bits/token). Zero libm; the floor approximation can
    * leave small negative totals for near-identical distributions —
    * deterministic, and the RANKING (which source drifted most) is the
    * contract.
    *
    * Shape: one (source, token) count aggregate, then the
    * sources × vocabulary dense frame for the smoothing — bounded when
    * the monitoring vocabulary is (top-k tokens via [[Sketches.FreqItems]]
    * at open vocabularies, the standard drift-monitor practice); this is
    * the q110 metadata-frame argument at the (source, vocab) grain. */
  def vocabKlDrift(docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("w"))
    // pinned: the token-count pipeline feeds the source list, the totals,
    // and the dense left join — one explode pass, not three
    val counts = PinnedCache.pin(
      tok.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c")))
    val tot = counts.groupBy(col("w")).agg(sum(col("c")).as("t"))
    val dense = counts.select(col("source")).distinct()
      .crossJoin(broadcast(tot))
      .join(counts, Seq("source", "w"), "left")
      .withColumn("ca", coalesce(col("c"), lit(0L)))
      .withColumn("cb", col("t") - col("ca"))
    val stot = dense.groupBy(col("source"))
      .agg(sum(col("ca")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("ca") + 1).as("na"), sum(col("cb") + 1).as("nb"))
    dense.join(stot, "source")
      .withColumn("term", (col("ca") + 1) *
        (quarterLog2((col("ca") + 1) * col("nb")) -
          quarterLog2((col("cb") + 1) * col("na"))))
      .groupBy(col("source"))
      .agg(max(col("n_tokens")).as("n_tokens"), max(col("vocab")).as("vocab"),
        sum(col("term")).as("kl_q4"), max(col("na")).as("na"))
      // clamp before dividing: true KL >= 0 (negatives are quarter-bit
      // floor artifacts), and Spark `div` truncates while DuckDB `//`
      // floors — they disagree exactly on negative dividends
      .withColumn("kl_mq4", expr("(greatest(kl_q4, 0L) * 1000) div na"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("kl_q4"),
        col("kl_mq4"))
  }

  def tokenLogOdds(docs: DataFrame, textCol: String, srcCol: String,
      target: String): DataFrame = {
    val tok = docs.select((col(srcCol) === target).as("is_a"),
      explode(tokens(col(textCol))).as("w"))
    val counts = tok.groupBy(col("w")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("is_a"), 0L).otherwise(1L)).as("cnt_b"))
    val totals = counts.agg(sum(col("cnt_a")).as("tot_a"),
      sum(col("cnt_b")).as("tot_b"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("lor_q",
        quarterLog2((col("cnt_a") + 1) * (col("tot_b") + col("v"))) -
          quarterLog2((col("cnt_b") + 1) * (col("tot_a") + col("v"))))
      .select(col("w"), col("cnt_a"), col("cnt_b"), col("lor_q"))
  }

  /** Unigram-LM surprisal scoring — the CCNet-style perplexity filter: fit
    * the cheapest possible LM (unigram counts over the corpus itself) and
    * score every document by its average per-token surprisal
    * -log2 p(w) = log2 N - log2 cnt(w), measured in [[quarterLog2]]
    * quarter-bits so the whole statistic is integer-exact cross-engine
    * (one final double division for the human-readable bits/token).
    * Low surprisal = template/boilerplate mass; high = rare-token noise;
    * production keeps the middle of the curve.
    *
    * `band` demonstrates the integer-cut pattern on ABSOLUTE thresholds
    * (bits_q4·1000 vs cut·n — no doubles in the decision); a production
    * pipeline would cut at per-language QUANTILES of bits_per_token —
    * compose with [[Histogram.gridQuantiles]] for exactly that.
    *
    * Scale shape: one vocabulary aggregate (map-side partials), one
    * token-keyed annotation join (AQE broadcasts the vocab side when
    * small and skew-splits hot stopword keys otherwise), one per-doc
    * aggregate; the 1-row corpus total broadcasts. Nothing shuffles but
    * (token, count) pairs and per-doc partial sums. */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    val tf = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), quarterLog2(col("cnt")).as("ql"))
    val nq = tok.agg(count(lit(1)).as("nt"))
      .select(quarterLog2(col("nt")).as("qn"))
    tok.join(tf, "w")
      .crossJoin(broadcast(nq))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("qn") - col("ql")).as("bits_q4"))
      .select(col("doc_id"), col("n_tokens"), col("bits_q4"),
        (col("bits_q4").cast("double") / (col("n_tokens") * 4)).as("bits_per_token"),
        when(col("bits_q4") * 1000 < col("n_tokens") * 19052, "common")
          .when(col("bits_q4") * 1000 > col("n_tokens") * 19100, "rare")
          .otherwise("mid").as("band"))
  }

  /** Shannon entropy of each group's TOKEN distribution, in
    * [[quarterLog2]] quarter-bits — H = Σ p(w)·log2(1/p(w)) computed as
    * the pure-integer Σ cnt·(q4(N) - q4(cnt)) with ONE double division at
    * the end. The vocabulary-collapse detector: template/model-generated
    * spam has low token entropy, organic text sits near log2(vocab)
    * (weighted); pairs with [[unigramSurprisal]] (which scores DOCS
    * against the corpus LM; this scores SOURCES by their own
    * distribution). Scale shape: one (group, token) aggregate with
    * map-side partials, one group-level reduction — per-group state is
    * the occupied vocabulary. */
  def tokenEntropy(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(groupCol).as("grp"),
      explode(split(col(textCol), " ")).as("w"))
    val tf = tok.groupBy(col("grp"), col("w")).agg(count(lit(1)).as("cnt"))
    tf.groupBy(col("grp"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("cnt") * quarterLog2(col("cnt"))).as("sum_cq4"))
      .select(col("grp"), col("n_tokens"), col("vocab"),
        (col("n_tokens") * quarterLog2(col("n_tokens")) - col("sum_cq4")).as("ent_q4"),
        ((col("n_tokens") * quarterLog2(col("n_tokens")) - col("sum_cq4")).cast("double")
          / (col("n_tokens") * 4)).as("entropy_bits"))
  }

  /** Gopher-style quality rule flags — the standard heuristic filter set
    * (word-count bounds, mean-word-length band, alphabetic-word fraction,
    * stopword presence, type-token repetition floor), each decided by a
    * PURE INTEGER comparison (counts cross-multiplied against rational
    * thresholds — no doubles anywhere, so every flag is bit-exact
    * cross-engine). Map-only over a hoisted token array (DEVNOTES rule
    * 10); emits per-rule flags plus the conjunction so downstream can
    * both filter and audit WHY a doc was dropped. */
  def gopherRules(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"),
      length(col(textCol)).as("chars"))
    val f = t.select(col("doc_id"), size(col("toks")).as("wc"),
      (col("chars") - (size(col("toks")) - 1)).as("cw"),
      size(filter(col("toks"), w => w.rlike("[A-Za-z]"))).as("alpha"),
      size(array_distinct(col("toks"))).as("vocab"),
      size(filter(array_distinct(col("toks")),
        w => w.isInCollection(EnStopwords))).as("sw"))
    f.select(col("doc_id"), col("wc").cast("long").as("wc"),
      col("wc").between(50, 100000).as("wc_ok"),
      (col("cw") >= col("wc") * 3 && col("cw") <= col("wc") * 10).as("wordlen_ok"),
      (col("alpha") * 5 > col("wc") * 4).as("alpha_ok"),
      (col("sw") >= 2).as("stopword_ok"),
      (col("vocab") * 10 >= col("wc") * 3).as("ttr_ok"))
      .withColumn("keep",
        col("wc_ok") && col("wordlen_ok") && col("alpha_ok") &&
          col("stopword_ok") && col("ttr_ok"))
  }

  /** JVM mirror of [[gopherRules]]' keep decision for per-row streaming
    * state code — same tokenization (split keeps trailing empties, like
    * Spark's `split`), same ASCII-letter test as `rlike("[A-Za-z]")`,
    * same integer comparisons. Pinned equal to the Column form in
    * `TransformWithStateSpec` (stream counters == batch flags). */
  def gopherKeepJvm(text: String): Boolean = {
    val toks = text.split(" ", -1)
    val wc = toks.length
    // code POINTS, not UTF-16 units: Spark's length() counts code points, so
    // any non-BMP char (emoji, CJK-ext) would make String.length diverge
    val cw = text.codePointCount(0, text.length) - (wc - 1)
    val alpha = toks.count(_.exists(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
    val distinct = toks.distinct
    val vocab = distinct.length
    val sw = distinct.count(EnStopwords.contains)
    wc >= 50 && wc <= 100000 &&
      cw >= 3 * wc && cw <= 10 * wc &&
      alpha * 5 > wc * 4 &&
      sw >= 2 &&
      vocab * 10 >= wc * 3
  }

  /** Interpreted HOF reference of [[simhashN]] — kept for the
    * codegen-vs-reference agreement test (the VecDot pattern). */
  def simhashNHof(textCol: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")
    expr(
      s"""aggregate(
         |  transform(array_distinct(split($textCol, ' ')),
         |            t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
         |  array_repeat(0L, $bits),
         |  (acc, h) -> zip_with(acc, sequence(0, ${bits - 1}),
         |                       (a, i) -> a + if((shiftright(h, i) & 1) = 1, 1L, -1L)),
         |  acc -> aggregate(zip_with(acc, sequence(0, ${bits - 1}),
         |                            (a, i) -> if(a > 0, shiftleft(cast(1 as bigint), i), 0L)),
         |                   0L, (x, y) -> x + y))""".stripMargin)
  }

  /** Directional cross-entropy transfer matrix between sources:
    * H(a → b) = Σ_w ca_w · (q4(N_b + V) − q4(cb_w + 1)) in quarter-bits —
    * the surprisal of source a's tokens under source b's Laplace-smoothed
    * unigram LM. Low H(a → b) means b's data already models a (transfer
    * value / redundancy); the directional complement of [[vocabKlDrift]]'s
    * vs-rest divergence. Only (a, w) rows with ca_w > 0 carry terms, so
    * no dense fill: the frame is counts × sources, bounded by the
    * monitoring vocabulary. `ce_mq4` normalizes per a-token
    * (milli-quarter-bits). Zero libm, bit-exact cross-engine. */
  def crossEntropyMatrix(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val counts = graft.ext.PinnedCache.pin(
      docs.select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c")))
    val v = counts.select(col("w")).distinct().count()
    val srcTot = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    counts.select(col("source").as("src_a"), col("w"), col("c").as("ca"))
      .join(srcTot.select(col("source").as("src_b"), col("n").as("nb")),
        col("src_a") =!= col("src_b"))
      .join(counts.select(col("source").as("src_b"), col("w"),
        col("c").as("cb")), Seq("src_b", "w"), "left_outer")
      .withColumn("term", col("ca") *
        (quarterLog2(col("nb") + v) - quarterLog2(coalesce(col("cb"), lit(0L)) + 1)))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ca")).as("n_tokens_a"), sum(col("term")).as("ce_q4"))
      .withColumn("ce_mq4", expr("(ce_q4 * 1000) div n_tokens_a"))
  }

  /** LEXICAL DIVERSITY per group — the vocabulary-richness readout a
    * curator reads next to [[tokenEntropy]]: per group, token count,
    * TYPE count (distinct tokens), HAPAX count (types seen exactly
    * once), type-token ratio and hapax share in exact integer ppm (one
    * floor each, decimal(38,0) rails — TTR comparisons across sources
    * of similar size are the honest use; TTR falls with corpus size by
    * Heaps' law, stated not hidden). A template-generated source shows
    * LOW ttr and hapax share; scraped natural text sits high. Shape:
    * one explode + (group, token) rollup + group rollup — all
    * partial-agg friendly. Output: (grp, n_tokens, n_types, n_hapax,
    * ttr_ppm, hapax_ppm). */
  def lexicalDiversity(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = df
    .select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("tok"))
    .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
    .groupBy(col("grp"))
    .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
      expr("(cast(n_types as decimal(38,0)) * 1000000) div n_tokens")
        .as("ttr_ppm"),
      expr("(cast(n_hapax as decimal(38,0)) * 1000000) div n_types")
        .as("hapax_ppm"))

  /** Chao1 + Good-Turing vocabulary richness per group — "how much
    * vocabulary have we NOT seen yet?", the corpus-planning readout
    * behind crawl-more / stop-crawling decisions. With S observed
    * types, f1 singleton types, f2 doubleton types: chao1 = S +
    * f1(f1−1)/(2(f2+1)) (the bias-corrected estimator — defined even
    * when f2 = 0) lower-bounds the true vocabulary size, and the
    * Good-Turing unseen mass f1/N is the probability the NEXT token
    * drawn is an unseen type. Exact integers: one truncating div each
    * on decimal(38,0) rails; no logs, no floats — both estimators are
    * exactly portable. Same two-rollup partial-agg shape as
    * [[lexicalDiversity]].
    * Output: (grp, n_tokens, n_types, f1, f2, chao1, gt_unseen_ppm). */
  def vocabularyRichness(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    richnessFromCounts(tokenCounts(df, groupCol, textCol))

  /** The (grp, tok, c) token-count frame behind [[vocabularyRichness]]
    * — and the MAINTAINED STATE of [[incrementalTokenCounts]]: the
    * rollup a streaming corpus accountant keeps instead of re-scanning
    * the archive nightly. */
  def tokenCounts(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = df
    .select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("tok"))
    .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))

  /** INCREMENTAL token counts: merge a DELTA of new documents into a
    * maintained (grp, tok, c) frame — counts are a pure monoid, so the
    * merged frame is bit-identical to re-rolling base ∪ delta while
    * only the delta is ever tokenized (cost ∝ delta text + touched
    * vocabulary; the archive is never re-read). Richness readouts
    * ([[richnessFromCounts]]) over the maintained frame ≡ the batch
    * operator, by composition — the corpus-accounting analog of the
    * graph family's maintained forms. Contract: delta documents are
    * NEW (an updated document must be retracted upstream first). */
  def incrementalTokenCounts(prevCounts: DataFrame, deltaDf: DataFrame,
      groupCol: String, textCol: String): DataFrame = prevCounts
    .toDF("grp", "tok", "c")
    .join(tokenCounts(deltaDf, groupCol, textCol)
      .withColumnRenamed("c", "dc"), Seq("grp", "tok"), "full_outer")
    .select(col("grp"), col("tok"),
      (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))

  /** Chao1/Good-Turing readout over a (grp, tok, c) frame — shared by
    * the one-shot and maintained paths. */
  def richnessFromCounts(counts: DataFrame): DataFrame = counts
    .toDF("grp", "tok", "c")
    .groupBy(col("grp"))
    .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
    .select(col("grp"), col("n_tokens"), col("n_types"), col("f1"), col("f2"),
      (col("n_types") +
        expr("(cast(f1 as decimal(38,0)) * (f1 - 1)) div (2 * (f2 + 1))"))
        .as("chao1"),
      expr("(cast(f1 as decimal(38,0)) * 1000000) div n_tokens")
        .as("gt_unseen_ppm"))
}
