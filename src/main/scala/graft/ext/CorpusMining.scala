package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Corpus-mining operators for training-data pipelines: cross-document
  * repeated-span rate, tf-idf keyword extraction, collocation mining,
  * event-rate anomaly flagging, and per-group inequality (Gini) stats.
  *
  * Determinism rules (DEVNOTES #3/#4): every score is either an integer
  * rational (exact in both engines) or a fixed-order double expression
  * whose operations are all IEEE correctly-rounded (one multiply, one
  * divide, `sqrt`) — no transcendentals, so results hash bit-exact against
  * the DuckDB oracle.
  */
object CorpusMining {

  /** Portable 60-bit hash of a string — identical in Spark
    * (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
    * (`CAST(('0x'||substring(md5(x),1,15)) AS BIGINT)`). */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Cross-document repeated n-gram rate (the RefinedWeb/Gopher-style
    * corpus-dedup signal): for each document, the fraction of its word
    * n-gram spans whose gram occurs in >= 2 distinct documents.
    *
    * Scale shape: grams are hashed to int64 BEFORE any shuffle (the q26
    * lesson — shuffle longs, not strings): one gram-keyed aggregate for
    * distinct-doc counts, one gram-keyed join back, one doc-keyed rollup
    * of longs. All aggregates are map-side combinable; nothing is
    * collected. Docs shorter than n tokens have no spans and drop out
    * (both engines). */
  def repeatedNgramRate(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val grams = toks
      .select(col("doc_id"),
        explode(TextAnalysis.ngramsFromTokens("toks", n)).as("g"))
      .select(col("doc_id"), hash60(col("g")).as("h"))
    val docFreq = grams.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("ndocs"))
    grams
      .join(docFreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        (col("dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
  }

  /** Exact-substring span dedup (the "exact substring deduplication"
    * transform of training-data pipelines, done at word-span granularity):
    * remove every token covered by a length-`n` span whose gram occurs in
    * >= 2 DISTINCT documents. Within-document self-repetition alone never
    * triggers removal (cross-doc criterion — documented delta from
    * suffix-array tools that also collapse self-repeats).
    *
    * Output per doc: token counts before/after and the md5 fingerprint of
    * the cleaned text (the text itself stays distributed).
    *
    * Scale shape: gram hashes (int64, never strings) carry one gram-keyed
    * distinct+count shuffle and one semi-join; dup span starts return to
    * their doc via one doc-keyed aggregate whose payload is bounded by the
    * doc's own length; the rebuild is a map-only HOF pass. */
  def removeRepeatedSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("t"))
    val g = toks
      .select(col("doc_id"),
        posexplode(TextAnalysis.ngramsFromTokens("t", n)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("i"),
        hash60(col("g")).as("h"))
    val dup = g.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .where(col("nd") >= 2).select(col("h"))
    val starts = g.join(dup, "h")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("i"))).as("starts"))
    toks.join(starts, Seq("doc_id"), "left_outer")
      .withColumn("ds", coalesce(col("starts"), array().cast("array<long>")))
      // codegen two-pointer sweep, O(tokens + starts) per doc; the HOF
      // reference formulation lives in [[spanFilterHof]] (cross-check test)
      .withColumn("k", expr(s"graft_span_filter(t, ds, $n)"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("k"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", col("k"))).as("cleaned_fp"))
  }

  /** Interpreted HOF reference of the `graft_span_filter` expression —
    * O(tokens × starts), kept for the codegen-vs-reference agreement test
    * (the VecDot pattern). `tokCol`/`startsCol` must be plain column names. */
  def spanFilterHof(tokCol: String, startsCol: String, n: Int): Column =
    expr(s"filter($tokCol, (tok, j0) -> NOT exists($startsCol, " +
      s"s -> s <= j0 + 1 AND j0 + 1 <= s + ${n - 1}))")

  /** Per-document top-k keywords by rational tf-idf: score
    * = tf * N / df as one integer product then one double division (the
    * log-free idf variant, so ordering is cross-engine exact). Ties break
    * on the term. The classic TF-DF shape: one (doc,term)-keyed count,
    * one term-keyed document-frequency aggregate, one term-keyed join
    * (vocabulary-sized build side — broadcastable when it fits), one
    * per-doc top-k window. */
  def tfidfKeywords(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.distinct().groupBy(col("w")).agg(count(lit(1)).as("df"))
    val total = docs.groupBy().agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, "w")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("w"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("w"))))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("w"),
        col("tf"), col("df"), col("score"))
  }

  /** Corpus-level bigram collocations ranked by lift
    * = n_xy * T / (n_x * n_y) — the log-free PMI analog (exact integer
    * products, one double division). `minCount` keeps the candidate set
    * sparse; at 100 TB the BIGINT products need a DECIMAL(38,0) upgrade
    * (documented, not hit at bench scale).
    *
    * Shape: one bigram-keyed count, one token-keyed count (joined twice —
    * vocabulary-sized, broadcastable), top-k via a single final sort of
    * the filtered candidates. */
  def collocations(docs: DataFrame, textCol: String, idCol: String,
      minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.groupBy().agg(sum(col("c")).as("t"))
    val bi = toks
      .select(explode(TextAnalysis.ngramsFromTokens("toks", 2)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_xy"))
      .where(col("n_xy") >= minCount)
      .select(col("b"), element_at(split(col("b"), " "), 1).as("w1"),
        element_at(split(col("b"), " "), 2).as("w2"), col("n_xy"))
    bi
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("n_x"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("n_y"))), "w2")
      .crossJoin(broadcast(total))
      .select(col("b"), col("n_xy"), col("n_x"), col("n_y"),
        ((col("n_xy") * col("t")).cast("double") / (col("n_x") * col("n_y")))
          .as("lift"))
      .orderBy(col("lift").desc, col("b"))
      .limit(k)
  }

  /** Hourly event-rate anomalies per event type: z-score of each hour's
    * count against the type's own hourly distribution. The anomaly FLAG is
    * decided in pure integer arithmetic — |n - S/H| > 2*sigma is
    * equivalent to (H*n - S)^2 > 4*(H*Q - S^2) with S = sum n, Q = sum n^2
    * over the type's H hours — so the cut is bit-exact cross-engine; the
    * reported z = (H*n - S)/sqrt(H*Q - S^2) is one subtraction, one sqrt,
    * one division (all correctly rounded). Constant series (zero variance)
    * report z = 0. BIGINT products hold to ~3e9 events/type-hour;
    * DECIMAL(38,0) is the 100 TB upgrade.
    *
    * Shape: one (type,hour)-keyed count, one type-keyed 3-long rollup
    * (tiny — one row per type, broadcast join back). */
  def hourlyAnomalies(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    val hc = events
      .select(col(typeCol).as("event_type"),
        expr(s"$tsNanosCol div 3600000000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
    val st = hc.groupBy(col("event_type"))
      .agg(count(lit(1)).as("h"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("q"))
    hc
      .join(broadcast(st), "event_type")
      .select(col("event_type"), col("hr"), col("n"),
        when(col("h") * col("q") - col("s") * col("s") === 0, lit(0.0))
          .otherwise((col("h") * col("n") - col("s")).cast("double") /
            sqrt((col("h") * col("q") - col("s") * col("s")).cast("double")))
          .as("z"),
        when((col("h") * col("n") - col("s")) * (col("h") * col("n") - col("s"))
          > lit(4L) * (col("h") * col("q") - col("s") * col("s")), 1L)
          .otherwise(0L).as("is_anomaly"))
  }

  /** Per-source boilerplate detection: the top-k most-repeated word
    * n-grams within each source (crawl template text shows up as the same
    * span occurring across a source's documents). Counting and ranking run
    * entirely on int64 gram hashes (ties break on the hash — portable);
    * the winning hashes (a k×sources-bounded set) broadcast back into one
    * map-side pass over the gram stream to recover display strings —
    * gram STRINGS never shuffle. Hash collisions resolve to min(gram) in
    * both engines. */
  def boilerplate(docs: DataFrame, textCol: String, srcCol: String, n: Int,
      minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(col(srcCol).as("source"),
      split(col(textCol), " ").as("toks"))
    val grams = toks.select(col("source"),
      explode(TextAnalysis.ngramsFromTokens("toks", n)).as("g"))
    val hashed = grams.select(col("source"), hash60(col("g")).as("h"), col("g"))
    val top = hashed
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("h"))))
      .where(col("rk") <= k)
    hashed
      .join(broadcast(top), Seq("source", "h"))
      .groupBy(col("source"), col("h"))
      .agg(max(col("rk")).as("rk0"), max(col("cnt")).as("cnt"), min(col("g")).as("gram"))
      .select(col("source"), col("rk0").cast("long").as("rk"), col("gram"), col("cnt"))
  }

  /** Market-basket co-occurrence mining (support counting over orders):
    * pairs of parts appearing in the same order, with support >= minCount,
    * top-k by support. The self-join is keyed by order — fan-out is
    * bounded by the per-order basket size (<= ~13 parts in this schema),
    * so cost is O(orders × basket²), never all-pairs over the catalog. */
  def copurchasePairs(lineitem: DataFrame, orderCol: String, partCol: String,
      minCount: Long, k: Int): DataFrame = {
    val lp = lineitem.select(col(orderCol).as("o"), col(partCol).as("p")).distinct()
    lp.as("a").join(lp.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minCount)
      .orderBy(col("support").desc, col("p1"), col("p2"))
      .limit(k)
  }

  /** Pearson correlation of two INTEGER-valued columns via exact integer
    * moments: r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² −
    * (Σy)²)) — the moments are BIGINT-exact, and the final expression is
    * two correctly-rounded sqrts, one multiply, one divide, so r matches
    * the DuckDB oracle bit-for-bit (built-in corr() implementations use
    * engine-specific streaming updates and do not). Callers quantize
    * non-integer measures onto a grid first (the q58 lesson). Degenerate
    * (zero-variance) inputs report r = 0. One map pass + a 5-long global
    * rollup. */
  def pearsonIntGrid(df: DataFrame, x: Column, y: Column): DataFrame =
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0 ||
          col("n") * col("syy") - col("sy") * col("sy") === 0, lit(0.0))
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("r"))

  /** Exact phrase search: documents containing `phrase` as a token
    * subsequence, with the occurrence count (all positions, overlapping
    * included).
    *
    * Scale shape: ONE map-only pass — the token array is hoisted into a
    * named column (DEVNOTES rule 10) and every candidate position does a
    * bounded m-token slice comparison against the phrase literal; no
    * shuffle, no join, nothing collected. At 100 TB a phrase query is a
    * single scan, embarrassingly parallel. (For high-QPS repeated
    * queries, build a gram inverted index once — the q76 hashed-gram
    * machinery — and turn each query into an index equality lookup; the
    * scan below is the verify stage of that design and the whole of the
    * one-off design.) Docs shorter than the phrase have no candidate
    * positions (the `when` guard also keeps `sequence` off descending
    * bounds — DEVNOTES rule 11). */
  def phraseOccurrences(docs: DataFrame, textCol: String, idCol: String,
      phrase: String): DataFrame = {
    val pts = phrase.split(" ").toSeq
    val m = pts.length
    require(m >= 1, "phrase must have at least one token")
    docs.select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol),
        when(size(col("t")) >= m,
          size(filter(sequence(lit(1), size(col("t")) - (m - 1)),
            i => slice(col("t"), i, lit(m)) === typedLit(pts))))
          .otherwise(0).cast("long").as("n_occ"))
      .where(col("n_occ") > 0)
  }

  /** Per-group Gini coefficient of a per-row integer measure (token
    * counts): with group rows sorted ascending and 1-based rank i,
    * gini = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) — integer
    * numerator/denominator, one double division. Equal values commute in
    * sum(i*x_i), so the tiebreaker only fixes determinism of the plan,
    * not the result. One group-keyed sort (rank window) + one group-keyed
    * rollup of longs. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: Column,
      tieCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), valueCol.cast("long").as("x"),
      tieCol.as("tie"))
    val ranked = base.withColumn("i",
      row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("x"), col("tie"))).cast("long"))
    ranked
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sum_x"),
        sum(col("i") * col("x")).as("rank_wsum"))
      .select(col("grp"), col("n_docs"), col("sum_x"),
        ((lit(2L) * col("rank_wsum") - (col("n_docs") + 1) * col("sum_x"))
          .cast("double") / (col("n_docs") * col("sum_x"))).as("gini"))
  }

  /** BM25-shaped ranked retrieval over the corpus for a fixed term list:
    * classic term-frequency saturation and length normalization with
    * k1 = 6/5 and b = 3/4, exact-integer cross-multiplied so each term
    * contributes ONE double division —
    * `score_t = (2N-2df+1)·22·T·tf / ((2df+1)·(10·T·tf + 3T + 9·dl·N))`
    * (derivation: multiply BM25's tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl))
    * through by 10T with avgdl = T/N, then apply the q77 log-free
    * rational idf (2N-2df+1)/(2df+1) in place of ln-idf — monotone in the
    * same direction, portable). Term scores add LEFT-TO-RIGHT in the
    * given term order (fixed-order double fold, DEVNOTES #4). Products
    * stay under 2^63 for corpora to ~10^9 tokens per the factors'
    * magnitudes; beyond that switch the numerators to decimal(38).
    *
    * Scale shape: corpus stats (N, T, per-term df) are one map-side
    * combinable aggregate broadcast back; tf/scoring is map-only; the
    * top-k is orderBy+limit (TakeOrderedAndProject — no global sort);
    * ranks are assigned on the k survivors only. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val d = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
    val statAggs = count(lit(1)).cast("long").as("n") +:
      sum(col("dl")).as("tt") +:
      terms.zipWithIndex.map { case (term, i) =>
        sum(when(array_contains(col("t"), term), 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = d.agg(statAggs.head, statAggs.tail: _*)
    val f = d.select(col("doc_id") +: col("dl") +:
      terms.zipWithIndex.map { case (term, i) =>
        size(filter(col("t"), x => x === term)).cast("long").as(s"tf$i")
      }: _*)
    val termScores = terms.indices.map { i =>
      val tf = col(s"tf$i"); val df = col(s"df$i")
      when(tf > 0,
        ((lit(2L) * col("n") - lit(2L) * df + lit(1L)) * lit(22L) * col("tt") * tf)
          .cast("double") /
          ((lit(2L) * df + lit(1L)) *
            (lit(10L) * col("tt") * tf + lit(3L) * col("tt") +
              lit(9L) * col("dl") * col("n"))).cast("double"))
        .otherwise(lit(0.0))
    }
    val top = f.crossJoin(broadcast(stats))
      .withColumn("score", termScores.reduce(_ + _))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank over the k survivors only — the window never sees the corpus
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("score"), col("rank"))
  }

  /** Frequent 3-itemsets over (basket, item) rows via A-priori pruning —
    * distributed market-basket mining one level above [[q86]]'s pair
    * affinity. The candidate space is the downward-closure bound: a
    * triple can only be frequent if all three of its pairs are, so
    * per-basket pairs are SEMI-JOINED against the frequent-pair set
    * before triples are ever enumerated (candidate volume ∝ frequent-pair
    * fan-out, never Σ C(basket,3) — the property that makes basket mining
    * survive a mega-basket skew at 100 TB). Exactness is oracle-proven:
    * the DuckDB oracle brute-enumerates all triples and must match
    * bit-for-bit, i.e. the pruning provably loses nothing.
    *
    * Returns (p1 < p2 < p3, support) with support >= minSup. */
  def frequentTriples(baskets: DataFrame, basketCol: String, itemCol: String,
      minSup: Long): DataFrame = {
    require(minSup >= 2, "minSup >= 2 (1 would emit every basket triple)")
    val b = PinnedCache.pin(baskets
      .select(col(basketCol).as("ok"), col(itemCol).as("pk")).distinct())
    // single-shuffle per-basket pair expansion (guide §2.3/§2.4 — see
    // Graphs.basketPairsPerBasket; identical pair multiset to the old
    // b ⋈ b self-join since b is per-basket distinct)
    val orderPairs = PinnedCache.pin(Graphs.basketPairsPerBasket(b))
    val fpairs = PinnedCache.pin(orderPairs.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n")).where(col("n") >= minSup)
      .select(col("p1"), col("p2")))
    // only pairs that are globally frequent survive into triple assembly
    val fop = orderPairs.join(fpairs, Seq("p1", "p2"), "left_semi")
    fop.as("a")
      .join(fop.as("c"),
        col("a.ok") === col("c.ok") && col("a.p2") === col("c.p1"))
      .select(col("a.ok").as("ok"), col("a.p1").as("p1"),
        col("a.p2").as("p2"), col("c.p2").as("p3"))
      .join(fpairs.select(col("p1"), col("p2").as("p3")), Seq("p1", "p3"),
        "left_semi")
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
  }

  /** Association rules (pair ⇒ item) from the frequent triples: for each
    * frequent triple and each of its three pair-antecedents,
    * confidence_ppm = sup(triple)·10^6 div sup(pair) and
    * lift_ppm = sup(triple)·N·10^6 div (sup(pair)·sup(item)) — the
    * recommendation-rule layer over [[frequentTriples]], pure integer
    * ratios. All inputs are support TABLES (itemset-cardinality-sized);
    * the raw basket stream is touched only by the support counts
    * themselves. Overflow bound: sup·N·10^6 < 2^63 up to ~10^9 baskets
    * with 10^3 support — past that, pre-divide N or go decimal. */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSup: Long): DataFrame = {
    val b = PinnedCache.pin(baskets
      .select(col(basketCol).as("ok"), col(itemCol).as("pk")).distinct())
    val nBaskets = b.select(col("ok")).distinct().count()
    val itemSup = b.groupBy(col("pk")).agg(count(lit(1)).as("cs"))
    val pairSup = PinnedCache.pin(Graphs.basketPairsPerBasket(b)
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("ps")).where(col("ps") >= minSup))
    val triples = PinnedCache.pin(
      frequentTriples(baskets, basketCol, itemCol, minSup))
    val rules = Seq(
      triples.select(col("p1").as("a1"), col("p2").as("a2"), col("p3").as("c"),
        col("support")),
      triples.select(col("p1").as("a1"), col("p3").as("a2"), col("p2").as("c"),
        col("support")),
      triples.select(col("p2").as("a1"), col("p3").as("a2"), col("p1").as("c"),
        col("support"))).reduce(_ unionByName _)
    rules
      .join(pairSup.select(col("p1").as("a1"), col("p2").as("a2"), col("ps")),
        Seq("a1", "a2"))
      .join(itemSup.select(col("pk").as("c"), col("cs")), Seq("c"))
      .select(col("a1"), col("a2"), col("c"), col("support"),
        expr("(support * 1000000) div ps").as("conf_ppm"),
        expr(s"(support * ${nBaskets}L * 1000000) div (ps * cs)").as("lift_ppm"))
  }

  /** Integer-idf term-overlap retrieval: score = Σ_{matched terms}
    * n·10^6 div df — the second lexical system for hybrid fusion
    * ([[rrfFuse]]): rare matched terms dominate, pure integers, zero
    * length normalization (deliberately DIFFERENT ranking behavior from
    * [[bm25TopK]], which is what makes fusing them informative). Same
    * scale shape as BM25: one stats row broadcast, map-side term probes,
    * top-k cut before any window. */
  def idfOverlapTopK(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "idfOverlapTopK needs at least one query term")
    val d = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
    val statAggs = count(lit(1)).cast("long").as("n") +:
      terms.zipWithIndex.map { case (term, i) =>
        sum(when(array_contains(col("t"), term), 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = d.agg(statAggs.head, statAggs.tail: _*)
    val scored = d.crossJoin(broadcast(stats))
      .withColumn("score_ppm", terms.zipWithIndex.map { case (term, i) =>
        when(array_contains(col("t"), term) && col(s"df$i") > 0,
          expr(s"(n * 1000000) div (df$i)")).otherwise(lit(0L))
      }.reduce(_ + _))
      .where(col("score_ppm") > 0)
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
    scored.withColumn("rank", row_number()
        .over(Window.orderBy(col("score_ppm").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("score_ppm"), col("rank"))
  }

  /** Reciprocal-rank fusion of named rankings (each `(doc_id, rank)`):
    * rrf_ppm = Σ_systems 10^6 div (c + rank) over the systems that ranked
    * the doc — the standard hybrid-retrieval combiner (lexical + semantic,
    * or BM25 + idf-overlap), integer end to end so the fused order is
    * bit-exact cross-engine. Absent ranks contribute 0 (the classic RRF
    * convention) and surface as rank_<system> = 0. The union of top-k
    * lists is k·systems rows — the global fusion window is bounded by the
    * cut that already happened inside each system. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.map { case (name, df) =>
      df.select(col("doc_id"), col("rank"), lit(name).as("sys"))
    }.reduce(_ unionByName _)
    val aggs = sum(expr(s"1000000 div ($c + rank)")).as("rrf_ppm") +:
      rankings.map { case (name, _) =>
        coalesce(max(when(col("sys") === name, col("rank"))), lit(0L))
          .as(s"rank_$name")
      }
    tagged.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .withColumn("fused_rank", row_number()
        .over(Window.orderBy(col("rrf_ppm").desc, col("doc_id"))).cast("long"))
  }

  def queries: Seq[QueryDef] = Seq(

    // Count-Min heavy-hitter audit (the Sketches.cms* operators): exact
    // top-20 tokens probed against a 4x1024 CM sketch of the full token
    // stream. The estimator is a pure function of the input multiset
    // (portable md5 bucket hashing), so even the APPROXIMATE estimates are
    // oracle-checked bit-for-bit (the q60 pattern). cms_est >= n_exact
    // always — the CM one-sided error guarantee, visible in the output.
    QueryDef(
      "q82_cms_heavyhitters",
      (s, dir) => {
        val depth = 4; val width = 1024
        val tok = tbl(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("item"))
        val exact = tok.groupBy(col("item")).agg(count(lit(1)).as("n_exact"))
        val top = exact.orderBy(col("n_exact").desc, col("item")).limit(20)
        val counters = Sketches.cmsCounters(tok, col("item"), depth, width)
        Sketches.cmsEstimate(top.select(col("item")), counters, "item", depth, width)
          .join(top, "item")
          .select(col("item").as("token"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("overcount"))
          .orderBy(col("n_exact").desc, col("token"))
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text,' ')) AS item FROM documents),
             |cnt AS (SELECT item, COUNT(*) AS n_exact FROM tok GROUP BY item),
             |top AS (SELECT item, n_exact FROM cnt ORDER BY n_exact DESC, item LIMIT 20),
             |counters AS (
             |  SELECT j, CAST(('0x'||substring(md5(j||':'||item),1,15)) AS BIGINT) % 1024 AS bucket,
             |         COUNT(*) AS c
             |  FROM tok, unnest([0,1,2,3]) AS u(j) GROUP BY 1, 2),
             |probes AS (
             |  SELECT t.item, t.n_exact, j,
             |    CAST(('0x'||substring(md5(j||':'||t.item),1,15)) AS BIGINT) % 1024 AS bucket
             |  FROM top t, unnest([0,1,2,3]) AS u(j))
             |SELECT p.item AS token, p.n_exact,
             |  CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS cms_est,
             |  CAST(MIN(COALESCE(c, 0)) - p.n_exact AS BIGINT) AS overcount
             |FROM probes p LEFT JOIN counters USING (j, bucket)
             |GROUP BY 1, 2 ORDER BY n_exact DESC, token""".stripMargin),
    ),

    QueryDef(
      "q76_repeated_ngrams",
      (s, dir) => repeatedNgramRate(tbl(s, dir, "documents"), "text", "doc_id", 8)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    CAST(('0x'||substring(md5(array_to_string(t[i:i+7],' ')),1,15)) AS BIGINT) AS h
             |  FROM toks, unnest(generate_series(1, len(t)-7)) AS u(i)
             |  WHERE len(t) >= 8),
             |dfq AS (SELECT h, COUNT(*) AS ndocs
             |        FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h)
             |SELECT g.doc_id, COUNT(*) AS n_spans,
             |  CAST(SUM(CASE WHEN dfq.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
             |  CAST(SUM(CASE WHEN dfq.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS dup_frac
             |FROM g JOIN dfq USING (h) GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin),
    ),

    QueryDef(
      "q77_tfidf_keywords",
      (s, dir) => tfidfKeywords(tbl(s, dir, "documents"), "text", "doc_id", 3)
        .orderBy(col("doc_id"), col("rk")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1,2),
             |dfq AS (SELECT w, COUNT(*) AS df
             |        FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, w, tf, df, CAST(tf*n_docs AS DOUBLE)/df AS score
             |  FROM tf JOIN dfq USING (w), n),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
             |       FROM scored)
             |SELECT doc_id, rk, w, tf, df, score FROM rk WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin),
    ),

    QueryDef(
      "q78_collocations",
      (s, dir) => collocations(tbl(s, dir, "documents"), "text", "doc_id", 20L, 50),
      Some("""WITH toks AS (SELECT string_split(text,' ') AS t FROM documents),
             |uni AS (SELECT unnest(t) AS w FROM toks),
             |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM uc),
             |bi AS (
             |  SELECT t[i]||' '||t[i+1] AS b
             |  FROM toks, unnest(generate_series(1, len(t)-1)) AS u(i)
             |  WHERE len(t) >= 2),
             |bc AS (SELECT b, COUNT(*) AS n_xy FROM bi GROUP BY b HAVING COUNT(*) >= 20)
             |SELECT b, n_xy, x.c AS n_x, y.c AS n_y,
             |  CAST(n_xy*tot.t AS DOUBLE)/(x.c*y.c) AS lift
             |FROM bc, tot
             |JOIN uc x ON x.w = string_split(b,' ')[1]
             |JOIN uc y ON y.w = string_split(b,' ')[2]
             |ORDER BY lift DESC, b LIMIT 50""".stripMargin),
    ),

    QueryDef(
      "q79_event_anomaly",
      (s, dir) => hourlyAnomalies(tbl(s, dir, "events"), "event_type", "ts")
        .orderBy(col("event_type"), col("hr")),
      Some("""WITH hc AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, COUNT(*) AS h, CAST(SUM(n) AS BIGINT) AS s,
             |              CAST(SUM(n*n) AS BIGINT) AS q FROM hc GROUP BY 1)
             |SELECT hc.event_type, hr, n,
             |  CASE WHEN h*q - s*s = 0 THEN 0.0
             |       ELSE CAST(h*n - s AS DOUBLE)/sqrt(CAST(h*q - s*s AS DOUBLE)) END AS z,
             |  CAST(CASE WHEN (h*n - s)*(h*n - s) > 4*(h*q - s*s) THEN 1 ELSE 0 END AS BIGINT)
             |    AS is_anomaly
             |FROM hc JOIN st USING (event_type) ORDER BY event_type, hr""".stripMargin),
    ),

    QueryDef(
      "q83_span_dedup",
      (s, dir) => removeRepeatedSpans(tbl(s, dir, "documents"), "text", "doc_id", 8)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |g AS (SELECT doc_id, i,
             |        CAST(('0x'||substring(md5(array_to_string(t[i:i+7],' ')),1,15)) AS BIGINT) AS h
             |      FROM toks, unnest(generate_series(1, len(t)-7)) AS u(i)
             |      WHERE len(t) >= 8),
             |dfq AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
             |        GROUP BY h HAVING COUNT(*) >= 2),
             |ds AS (SELECT doc_id, list_sort(list(i)) AS starts
             |       FROM g JOIN dfq USING (h) GROUP BY doc_id),
             |kept AS (
             |  SELECT toks.doc_id, t,
             |    [t[j] FOR j IN generate_series(1, len(t))
             |          IF len(list_filter(COALESCE(starts, CAST([] AS BIGINT[])),
             |                             s -> s <= j AND j <= s + 7)) = 0] AS k
             |  FROM toks LEFT JOIN ds USING (doc_id))
             |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             |  CAST(len(t) - len(k) AS BIGINT) AS n_removed,
             |  md5(COALESCE(array_to_string(k, ' '), '')) AS cleaned_fp
             |FROM kept ORDER BY doc_id""".stripMargin),
    ),

    // Cross-modal consistency mining: pairs whose TEXTS are near-dups
    // (3-gram Jaccard >= 0.5 via the MinHash-LSH pipeline) but whose
    // EMBEDDINGS disagree (cosine < 0.5) — the standard label-noise /
    // stale-embedding audit before training on paired corpora. One tiny
    // pair list joined twice against the embedding table; cosine via the
    // codegen graft_vec_dot. Oracle = brute-force exact pair scan (q26's
    // recall bound applies: 1-(1-J^2)^32 >= 0.9999 at J >= 0.5).
    QueryDef(
      "q84_modal_mismatch",
      (s, dir) => {
        val pairs = Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
        val n = Similarity.withNorm(tbl(s, dir, "embeddings"), "embedding")
        val ea = n.select(col("vec_id").as("a_id"), col("embedding").as("va"), col("nrm").as("na"))
        val eb = n.select(col("vec_id").as("b_id"), col("embedding").as("vb"), col("nrm").as("nb"))
        pairs.join(ea, "a_id").join(eb, "b_id")
          .withColumn("cos_sim", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .select(col("a_id"), col("b_id"), col("jaccard"), col("cos_sim"),
            when(col("cos_sim") < 0.5, 1L).otherwise(0L).as("modal_mismatch"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |p AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |n AS (
             |  SELECT vec_id, embedding,
             |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
             |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
             |  FROM embeddings)
             |SELECT p.a_id, p.b_id, p.jaccard,
             |  list_sum([CAST(na.embedding[i] AS DOUBLE)*nb.embedding[i]
             |            FOR i IN generate_series(1,len(na.embedding))])/(na.nrm*nb.nrm) AS cos_sim,
             |  CAST(CASE WHEN list_sum([CAST(na.embedding[i] AS DOUBLE)*nb.embedding[i]
             |                           FOR i IN generate_series(1,len(na.embedding))])/(na.nrm*nb.nrm) < 0.5
             |       THEN 1 ELSE 0 END AS BIGINT) AS modal_mismatch
             |FROM p JOIN n na ON na.vec_id = p.a_id
             |       JOIN n nb ON nb.vec_id = p.b_id
             |ORDER BY a_id, b_id""".stripMargin),
    ),

    QueryDef(
      "q85_boilerplate",
      (s, dir) => boilerplate(tbl(s, dir, "documents"), "text", "source", 4, 2L, 3)
        .orderBy(col("source"), col("rk")),
      Some("""WITH toks AS (SELECT source, string_split(text,' ') AS t FROM documents),
             |g AS (SELECT source, array_to_string(t[i:i+3],' ') AS g,
             |        CAST(('0x'||substring(md5(array_to_string(t[i:i+3],' ')),1,15)) AS BIGINT) AS h
             |      FROM toks, unnest(generate_series(1, len(t)-3)) AS u(i)
             |      WHERE len(t) >= 4),
             |c AS (SELECT source, h, min(g) AS gram, COUNT(*) AS cnt
             |      FROM g GROUP BY source, h HAVING COUNT(*) >= 2),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, h) AS rk
             |       FROM c)
             |SELECT source, rk, gram, cnt FROM rk WHERE rk <= 3
             |ORDER BY source, rk""".stripMargin),
    ),

    // Dedup-threshold retention sweep: how aggressive would near-dup
    // removal be at each Jaccard cut? One LSH pair list at the loosest
    // threshold, swept over tighter cuts with a literal-array explode —
    // pairs surviving each cut plus docs flagged for removal under min-id
    // survivorship. The tuning curve every dedup rollout wants before
    // committing a threshold; costs one extra row per (pair, threshold).
    QueryDef(
      "q87_dedup_sweep",
      (s, dir) => {
        val pairs = Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
        pairs
          .select(col("jaccard"), col("b_id"),
            explode(array(Seq(0.5, 0.6, 0.7, 0.8, 0.9).map(lit): _*)).as("threshold"))
          .where(col("jaccard") >= col("threshold"))
          .groupBy(col("threshold"))
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("b_id")).as("docs_flagged"))
          .orderBy(col("threshold"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |p AS (
             |  SELECT b.doc_id AS b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5)
             |SELECT CAST(t.threshold AS DOUBLE) AS threshold, COUNT(*) AS pairs,
             |  COUNT(DISTINCT b_id) AS docs_flagged
             |FROM p, unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t(threshold)
             |WHERE p.jaccard >= CAST(t.threshold AS DOUBLE)
             |GROUP BY 1 ORDER BY threshold""".stripMargin),
    ),

    // Per-user inter-event gap statistics — the stream-health /
    // sessionization-tuning metric: exact integer MICROS (lag diffs; micros
    // not nanos because DuckDB 1.0 truncates ns parquet to us timestamps —
    // the q53 lesson), so min/median/max are bit-exact cross-engine
    // (discrete rank quantile, the q49 pattern). One keyed window pass +
    // one keyed rollup.
    QueryDef(
      "q90_event_gaps",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val us = expr("ts div 1000")
        val gaps = tbl(s, dir, "events")
          .select(col("user_id"), (us - lag(us, 1).over(w)).as("gap"))
          .where(col("gap").isNotNull)
        gaps
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("gap"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_gaps"),
            min(col("gap")).as("min_gap"),
            max(when(col("rn") === ceil(lit(0.5) * col("n")), col("gap"))).as("p50_gap"),
            max(col("gap")).as("max_gap"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
             |  FROM events),
             |x AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
             |r AS (SELECT user_id, gap,
             |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
             |        COUNT(*) OVER (PARTITION BY user_id) AS n FROM x)
             |SELECT user_id, MAX(n) AS n_gaps, MIN(gap) AS min_gap,
             |  MAX(CASE WHEN rn = ceil(0.5*n) THEN gap END) AS p50_gap,
             |  MAX(gap) AS max_gap
             |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    QueryDef(
      "q86_copurchase",
      (s, dir) => copurchasePairs(tbl(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2L, 50),
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
             |SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
             |FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |ORDER BY support DESC, p1, p2 LIMIT 50""".stripMargin),
    ),

    // Week-over-week change per event type: weekly counts, previous week
    // via LAG, integer delta + one double division for the rate — the
    // trend line every event dashboard ships. One (type,week) count + one
    // type-keyed window pass over the tiny weekly table.
    QueryDef(
      "q95_wow_change",
      (s, dir) => {
        val wk = tbl(s, dir, "events")
          .select(col("event_type"), expr("ts div 604800000000000").as("week"))
          .groupBy(col("event_type"), col("week"))
          .agg(count(lit(1)).as("n"))
        wk
          .withColumn("prev", lag(col("n"), 1).over(
            Window.partitionBy(col("event_type")).orderBy(col("week"))))
          .select(col("event_type"), col("week"), col("n"),
            (col("n") - col("prev")).as("delta"),
            when(col("prev").isNotNull,
              (col("n") - col("prev")).cast("double") / col("prev")).as("wow_rate"))
          .orderBy(col("event_type"), col("week"))
      },
      Some("""WITH wk AS (
             |  SELECT event_type, epoch_ns(ts) // 604800000000000 AS week, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT event_type, week, n,
             |        LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev
             |      FROM wk)
             |SELECT event_type, week, n,
             |  CAST(n - prev AS BIGINT) AS delta,
             |  CASE WHEN prev IS NOT NULL THEN CAST(n - prev AS DOUBLE)/prev END AS wow_rate
             |FROM l ORDER BY event_type, week""".stripMargin),
    ),

    // Chunk-level exact dedup — the paragraph-dedup analog on fixed token
    // windows (dedup at a granularity between whole-doc q24 and span q83):
    // 16-token chunks fingerprinted (q50's operator), grouped by content,
    // duplicated chunks reported with min-(doc,chunk) survivorship. One
    // fingerprint-keyed shuffle of (fp, doc, idx) longs+hash — chunk TEXT
    // never shuffles.
    QueryDef(
      "q94_chunk_dedup",
      (s, dir) => Packing.chunkTokens(tbl(s, dir, "documents"), "text", "doc_id", 16)
        .groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keep_doc"),
          min(struct(col("doc_id"), col("chunk_id"))).getField("chunk_id").as("keep_chunk"))
        .where(col("copies") >= 2)
        .orderBy(col("chunk_md5")),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |e AS (SELECT doc_id, t,
             |        unnest(generate_series(1, (len(t)+15)//16)) AS i
             |      FROM d WHERE len(t) > 0),
             |c AS (SELECT doc_id, i-1 AS chunk_id,
             |        md5(array_to_string(t[(i-1)*16+1 : LEAST(len(t), i*16)], ' ')) AS chunk_md5
             |      FROM e)
             |SELECT chunk_md5, COUNT(*) AS copies,
             |  COUNT(DISTINCT doc_id) AS n_docs,
             |  MIN(doc_id) AS keep_doc,
             |  CAST(MIN(ROW(doc_id, chunk_id))[2] AS BIGINT) AS keep_chunk
             |FROM c GROUP BY chunk_md5 HAVING COUNT(*) >= 2
             |ORDER BY chunk_md5""".stripMargin),
    ),

    // Hierarchical KMV merge — the distributed-sketch rollup pattern at
    // 100 TB (per-partition/per-day sketches merged upward, raw data read
    // once): per-SOURCE trigram sketches re-aggregated into one global
    // sketch. KMV mergeability is exact — the k smallest of the union of
    // per-source k-smallest IS the k smallest of all distinct values — so
    // the merged estimate equals the direct global sketch bit-for-bit and
    // the oracle simply computes the direct sketch.
    QueryDef(
      "q93_kmv_merge",
      (s, dir) => {
        val k = 512
        val grams = tbl(s, dir, "documents")
          .select(col("source"), split(col("text"), " ").as("toks"))
          .select(col("source"), explode(TextAnalysis.ngramsFromTokens("toks", 3)).as("g"))
        val perSource = grams
          .groupBy(col("source"))
          .agg(Sketches.kMinValues(k)(Sampling.portableHash(col("g"))).as("hs"))
        val merged = perSource
          .select(explode(col("hs")).as("h"))
          .agg(Sketches.kMinValues(k)(col("h")).as("hs"))
        merged.select(
          size(col("hs")).cast("long").as("n_sketch"),
          Sketches.kthHashCol(col("hs"), k).as("kth_hash"),
          Sketches.estimateCol(col("hs"), k).as("est_distinct"))
      },
      Some("""WITH tok AS (SELECT string_split(text,' ') AS t FROM documents),
             |g AS (SELECT unnest([t[i]||' '||t[i+1]||' '||t[i+2]
             |                     FOR i IN generate_series(1, len(t)-2)]) AS g
             |      FROM tok WHERE len(t) >= 3),
             |h AS (SELECT DISTINCT CAST(('0x' || substring(md5(g),1,15)) AS BIGINT) AS h FROM g),
             |r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h)
             |SELECT LEAST(COUNT(*), 512) AS n_sketch,
             |  MAX(h) FILTER (WHERE rn = 512) AS kth_hash,
             |  CASE WHEN MAX(h) FILTER (WHERE rn = 512) IS NOT NULL
             |       THEN 511.0 * 1152921504606846976.0 / MAX(h) FILTER (WHERE rn = 512)
             |       ELSE CAST(LEAST(COUNT(*), 512) AS DOUBLE) END AS est_distinct
             |FROM r WHERE rn <= 512""".stripMargin),
    ),

    // Length-weighted deterministic sampling (P(keep) = tokens/512) with a
    // per-source audit: kept docs/tokens vs corpus, token share in exact
    // integer ppm. The mixture-balancing primitive — doc-uniform sampling
    // skews short; token-proportional keeps the token mix representative.
    QueryDef(
      "q92_weighted_sample",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("t", TextAnalysis.tokenCount(col("text")).cast("long"))
        val kept = Sampling.weightedSample(docs, "doc_id", col("t"), 512)
        val corpus = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("corpus_docs"), sum(col("t")).as("corpus_tokens"))
        kept.groupBy(col("source"))
          .agg(count(lit(1)).as("kept_docs"), sum(col("t")).as("kept_tokens"))
          .join(broadcast(corpus), "source")
          .select(col("source"), col("kept_docs"), col("kept_tokens"),
            col("corpus_docs"), col("corpus_tokens"),
            expr("kept_tokens * 1000000 div corpus_tokens").as("kept_token_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id, len(string_split(text,' ')) AS t FROM documents),
             |kept AS (
             |  SELECT * FROM d
             |  WHERE CAST(('0x'||substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 512 < t),
             |c AS (SELECT source, COUNT(*) AS corpus_docs, CAST(SUM(t) AS BIGINT) AS corpus_tokens
             |      FROM d GROUP BY source)
             |SELECT source, COUNT(*) AS kept_docs, CAST(SUM(kept.t) AS BIGINT) AS kept_tokens,
             |  corpus_docs, corpus_tokens,
             |  CAST(SUM(kept.t) * 1000000 // corpus_tokens AS BIGINT) AS kept_token_ppm
             |FROM kept JOIN c USING (source)
             |GROUP BY source, corpus_docs, corpus_tokens ORDER BY source""".stripMargin),
    ),

    // Corpus diagnostic: does document length predict the quality score?
    // Exact Pearson r with quality quantized to a 1/1000 grid (integer
    // moments stay inside BIGINT at 10^8+ docs; grid rounding is HALF_UP
    // in both engines for positives).
    QueryDef(
      "q91_corr_length_quality",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("q1000", round(
            TextAnalysis.qualityScore(col("text"), TextAnalysis.tokenCount(col("text"))) * 1000, 0))
        pearsonIntGrid(docs, TextAnalysis.tokenCount(col("text")).cast("long"), col("q1000"))
      },
      Some(s"""WITH base AS (
              |  SELECT len(string_split(text,' ')) AS t, LENGTH(text) AS c,
              |    string_split(text,' ') AS tokens
              |  FROM documents),
              |g AS (
              |  SELECT CAST(t AS BIGINT) AS x,
              |    CAST(round(ROUND(LEAST(t/50.0,1.0)*0.4 +
              |      (CAST(len(list_filter(tokens, w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)/t)*0.3 +
              |      CASE WHEN (c-(t-1))/CAST(t AS DOUBLE) BETWEEN 3 AND 8 THEN 0.3 ELSE 0.0 END, 6) * 1000, 0) AS BIGINT) AS y
              |  FROM base),
              |m AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              |        CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
              |        CAST(SUM(x*y) AS BIGINT) AS sxy FROM g)
              |SELECT n,
              |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN 0.0
              |       ELSE CAST(n*sxy - sx*sy AS DOUBLE)
              |            / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
              |  END AS r
              |FROM m""".stripMargin),
    ),

    QueryDef(
      "q80_source_gini",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        giniByGroup(docs, "source",
          size(split(col("text"), " ")).cast("long"), col("doc_id"))
          .withColumnRenamed("grp", "source")
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
             |  SELECT source AS grp, CAST(len(string_split(text,' ')) AS BIGINT) AS x, doc_id
             |  FROM documents),
             |ranked AS (
             |  SELECT grp, x, row_number() OVER (PARTITION BY grp ORDER BY x, doc_id) AS i
             |  FROM base)
             |SELECT grp AS source, COUNT(*) AS n_docs, CAST(SUM(x) AS BIGINT) AS sum_x,
             |  CAST(2*SUM(i*x) - (COUNT(*)+1)*SUM(x) AS DOUBLE)/(COUNT(*)*SUM(x)) AS gini
             |FROM ranked GROUP BY grp ORDER BY source""".stripMargin),
    ),

    // BM25-shaped ranked retrieval: top-k docs for a multi-term query.
    // Classic BM25 term saturation/length normalization (k1 = 6/5,
    // b = 3/4) in EXACT integer cross-multiplication — per term one
    // BIGINT numerator, one BIGINT denominator, ONE double division —
    // with the q77 log-free rational idf standing in for ln-idf
    // (monotone-equivalent, engine-portable). Terms sum left-to-right in
    // a FIXED literal order so the double sum is bit-identical across
    // engines (DEVNOTES #4); ranking ties break on doc_id. Scale: corpus
    // stats are one map-combinable aggregate broadcast back; scoring is
    // map-only; top-k is TakeOrderedAndProject.
    QueryDef(
      "q123_bm25_search",
      (s, dir) => bm25TopK(tbl(s, dir, "documents"), "text", "doc_id",
          Seq("vector", "merge", "window"), 10)
        .orderBy(col("rank")),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text,' ') AS t,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS dl
             |  FROM documents),
             |s AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt,
             |    CAST(SUM(CASE WHEN list_contains(t,'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             |    CAST(SUM(CASE WHEN list_contains(t,'merge') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             |    CAST(SUM(CASE WHEN list_contains(t,'window') THEN 1 ELSE 0 END) AS BIGINT) AS df2
             |  FROM d),
             |f AS (
             |  SELECT doc_id, dl,
             |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
             |    CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf1,
             |    CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT) AS tf2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    (CASE WHEN tf0 > 0 THEN
             |       CAST((2*n - 2*df0 + 1) * 22 * tt * tf0 AS DOUBLE)
             |       / CAST((2*df0 + 1) * (10*tt*tf0 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END
             |    + CASE WHEN tf1 > 0 THEN
             |       CAST((2*n - 2*df1 + 1) * 22 * tt * tf1 AS DOUBLE)
             |       / CAST((2*df1 + 1) * (10*tt*tf1 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END)
             |    + CASE WHEN tf2 > 0 THEN
             |       CAST((2*n - 2*df2 + 1) * 22 * tt * tf2 AS DOUBLE)
             |       / CAST((2*df2 + 1) * (10*tt*tf2 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END AS score
             |  FROM f, s),
             |r AS (
             |  SELECT doc_id, score,
             |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
             |  FROM sc WHERE score > 0)
             |SELECT doc_id, score, rank FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin),
    ),

    // Frequent 3-itemsets with A-priori pruning: triples assemble only
    // from globally-frequent pairs (downward closure), then exact support
    // count — the oracle brute-enumerates ALL triples, so a pass proves
    // the pruning lost nothing.
    QueryDef(
      "q176_frequent_triples",
      (s, dir) => frequentTriples(tbl(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSup = 2)
        .orderBy(col("p1"), col("p2"), col("p3")),
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |t AS (
             |  SELECT a.pk AS p1, bb.pk AS p2, c.pk AS p3
             |  FROM b a
             |  JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
             |  JOIN b c ON a.ok = c.ok AND bb.pk < c.pk)
             |SELECT p1, p2, p3, COUNT(*) AS support
             |FROM t GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
             |ORDER BY p1, p2, p3""".stripMargin),
    ),

    // Association rules (pair => item) over the frequent triples:
    // integer-ppm confidence and lift from itemset-sized support tables.
    QueryDef(
      "q177_association_rules",
      (s, dir) => associationRules(tbl(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSup = 2)
        .orderBy(col("a1"), col("a2"), col("c")),
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |nb AS (SELECT COUNT(DISTINCT ok) AS n FROM b),
             |itsup AS (SELECT pk, COUNT(*) AS cs FROM b GROUP BY pk),
             |ps AS (
             |  SELECT a.pk AS p1, bb.pk AS p2, COUNT(*) AS ps
             |  FROM b a JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |t AS (
             |  SELECT a.pk AS p1, bb.pk AS p2, c.pk AS p3, COUNT(*) AS support
             |  FROM b a
             |  JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
             |  JOIN b c ON a.ok = c.ok AND bb.pk < c.pk
             |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
             |r AS (
             |  SELECT p1 AS a1, p2 AS a2, p3 AS c, support FROM t
             |  UNION ALL SELECT p1, p3, p2, support FROM t
             |  UNION ALL SELECT p2, p3, p1, support FROM t)
             |SELECT r.a1, r.a2, r.c, r.support,
             |  (r.support * 1000000) // p.ps AS conf_ppm,
             |  (r.support * nb.n * 1000000) // (p.ps * i.cs) AS lift_ppm
             |FROM r
             |JOIN ps p ON p.p1 = r.a1 AND p.p2 = r.a2
             |JOIN itsup i ON i.pk = r.c
             |CROSS JOIN nb
             |ORDER BY r.a1, r.a2, r.c""".stripMargin),
    ),

    // Hybrid retrieval via reciprocal-rank fusion: BM25 (q123's system)
    // fused with the integer-idf overlap ranker over the same terms —
    // rrf_ppm = Σ 10^6 // (60 + rank), the standard lexical+X combiner,
    // integer end to end. The fusion window sees only the union of two
    // top-10 lists.
    QueryDef(
      "q169_rrf_hybrid",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val terms = Seq("vector", "merge", "window")
        rrfFuse(Seq(
            "bm25" -> bm25TopK(docs, "text", "doc_id", terms, 10)
              .select(col("doc_id"), col("rank")),
            "idf" -> idfOverlapTopK(docs, "text", "doc_id", terms, 10)
              .select(col("doc_id"), col("rank"))))
          .orderBy(col("fused_rank"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text,' ') AS t,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS dl
             |  FROM documents),
             |s AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt,
             |    CAST(SUM(CASE WHEN list_contains(t,'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             |    CAST(SUM(CASE WHEN list_contains(t,'merge') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             |    CAST(SUM(CASE WHEN list_contains(t,'window') THEN 1 ELSE 0 END) AS BIGINT) AS df2
             |  FROM d),
             |f AS (
             |  SELECT doc_id, dl,
             |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
             |    CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf1,
             |    CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT) AS tf2
             |  FROM d),
             |sc AS (
             |  SELECT doc_id,
             |    (CASE WHEN tf0 > 0 THEN
             |       CAST((2*n - 2*df0 + 1) * 22 * tt * tf0 AS DOUBLE)
             |       / CAST((2*df0 + 1) * (10*tt*tf0 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END
             |    + CASE WHEN tf1 > 0 THEN
             |       CAST((2*n - 2*df1 + 1) * 22 * tt * tf1 AS DOUBLE)
             |       / CAST((2*df1 + 1) * (10*tt*tf1 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END)
             |    + CASE WHEN tf2 > 0 THEN
             |       CAST((2*n - 2*df2 + 1) * 22 * tt * tf2 AS DOUBLE)
             |       / CAST((2*df2 + 1) * (10*tt*tf2 + 3*tt + 9*dl*n) AS DOUBLE)
             |     ELSE 0.0 END AS score
             |  FROM f, s),
             |bm AS (
             |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
             |  FROM sc WHERE score > 0),
             |io AS (
             |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank
             |  FROM (
             |    SELECT doc_id,
             |      (CASE WHEN list_contains(t,'vector') AND df0 > 0 THEN (n*1000000)//df0 ELSE 0 END
             |      + CASE WHEN list_contains(t,'merge') AND df1 > 0 THEN (n*1000000)//df1 ELSE 0 END
             |      + CASE WHEN list_contains(t,'window') AND df2 > 0 THEN (n*1000000)//df2 ELSE 0 END) AS score_ppm
             |    FROM d, s)
             |  WHERE score_ppm > 0),
             |u AS (
             |  SELECT doc_id, rank, 'bm25' AS sys FROM bm WHERE rank <= 10
             |  UNION ALL
             |  SELECT doc_id, rank, 'idf' FROM io WHERE rank <= 10),
             |fused AS (
             |  SELECT doc_id, CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
             |    CAST(COALESCE(MAX(CASE WHEN sys = 'bm25' THEN rank END), 0) AS BIGINT) AS rank_bm25,
             |    CAST(COALESCE(MAX(CASE WHEN sys = 'idf' THEN rank END), 0) AS BIGINT) AS rank_idf
             |  FROM u GROUP BY doc_id)
             |SELECT doc_id, rrf_ppm, rank_bm25, rank_idf,
             |  CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS fused_rank
             |FROM fused ORDER BY fused_rank""".stripMargin),
    ),

    // Exact phrase search as one map-only scan (phraseOccurrences): docs
    // containing the 3-token phrase, with overlapping-inclusive occurrence
    // counts. The oracle does the identical token-slice comparison.
    QueryDef(
      "q99_phrase_search",
      (s, dir) => phraseOccurrences(tbl(s, dir, "documents"), "text", "doc_id",
          "big order scan")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |o AS (SELECT doc_id,
             |        CAST(len([i FOR i IN generate_series(1, len(t)-2)
             |                  IF t[i:i+2] = ['big','order','scan']]) AS BIGINT) AS n_occ
             |      FROM t WHERE len(t) >= 3)
             |SELECT doc_id, n_occ FROM o WHERE n_occ > 0 ORDER BY doc_id""".stripMargin),
    ),
  )
}
