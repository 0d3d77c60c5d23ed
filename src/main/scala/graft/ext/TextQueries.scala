package graft.ext

import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Text analysis & curation family (CATALOG.md 'Text analysis & curation'): lang-ID, quality, tokenization, n-gram statistics, decontamination, drift.
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object TextQueries {

  def queries: Seq[QueryDef] = Seq(

    // Language-ID heuristic (stopword-hit ratio).
    QueryDef(
      "q31_langid",
      (s, dir) => {
        val score = TextAnalysis.stopwordRatio(col("text"))
        tbl(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.langPred(score).as("lang_pred"),
            round(score, 6).as("en_score"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  CASE WHEN score >= 0.05 THEN 'en' WHEN score > 0 THEN 'mixed'
              |       ELSE 'other' END AS lang_pred,
              |  ROUND(score, 6) AS en_score
              |FROM (SELECT doc_id,
              |        CAST(len(list_filter(string_split(text,' '),
              |             w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)
              |        / len(string_split(text,' ')) AS score
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin),
    ),


    // Quality scoring: length/stopword/word-shape composite.
    QueryDef(
      "q32_quality",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text"), TextAnalysis.tokenCount(col("text"))).as("quality"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ROUND(
              |  LEAST(t / 50.0, 1.0) * 0.4 +
              |  (CAST(len(list_filter(tokens, w -> w IN
              |     (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |  CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8 THEN 0.3 ELSE 0.0 END,
              |  6) AS quality
              |FROM (SELECT doc_id, string_split(text,' ') AS tokens,
              |             len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin),
    ),


    // Token counting rolled up per source.
    QueryDef(
      "q33_tokens",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("source"), TextAnalysis.tokenCount(col("text")).as("t"))
        .groupBy(col("source"))
        .agg(sum(col("t")).cast("long").as("total_tokens"),
          min(col("t")).cast("long").as("min_tokens"),
          max(col("t")).cast("long").as("max_tokens"),
          (sum(col("t")).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy(col("source")),
      Some("""SELECT source, CAST(SUM(t) AS BIGINT) AS total_tokens,
             |  MIN(t) AS min_tokens, MAX(t) AS max_tokens,
             |  CAST(SUM(t) AS DOUBLE) / COUNT(*) AS avg_tokens
             |FROM (SELECT source, len(string_split(text,' ')) AS t FROM documents)
             |GROUP BY source ORDER BY source""".stripMargin),
    ),


    // The composed curation pipeline: lang filter -> quality filter ->
    // exact dedup -> near-dup removal -> per-source corpus stats.
    QueryDef(
      "q40_curation",
      (s, dir) => Curation.curate(tbl(s, dir, "documents"), 0.5, 0.5)
        .orderBy(col("source")),
      Some(s"""WITH base AS (
              |  SELECT doc_id, text, source, string_split(text,' ') AS tokens,
              |    len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |  FROM documents),
              |scored AS (
              |  SELECT doc_id, text, source, t, tokens,
              |    CAST(len(list_filter(tokens, w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)/t AS sr,
              |    ROUND(LEAST(t/50.0,1.0)*0.4 +
              |      (CAST(len(list_filter(tokens, w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)/t)*0.3 +
              |      CASE WHEN (c-(t-1))/CAST(t AS DOUBLE) BETWEEN 3 AND 8 THEN 0.3 ELSE 0.0 END, 6) AS quality
              |  FROM base),
              |filtered AS (
              |  SELECT * FROM scored WHERE sr >= 0.05 AND quality >= 0.5),
              |exact_kept AS (
              |  SELECT * FROM filtered
              |  WHERE doc_id IN (SELECT MIN(doc_id) FROM filtered GROUP BY text)),
              |sh AS (
              |  SELECT doc_id,
              |    list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
              |                   FOR i IN generate_series(1, len(tokens)-2)]) AS s
              |  FROM exact_kept WHERE len(tokens) >= 3),
              |dropped AS (
              |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
              |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
              |kept AS (SELECT * FROM exact_kept
              |         WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
              |SELECT source, COUNT(*) AS kept_docs, CAST(SUM(t) AS BIGINT) AS kept_tokens,
              |  MIN(doc_id) AS first_doc
              |FROM kept GROUP BY source ORDER BY source""".stripMargin),
    ),


    // BPE-ish subword token estimate vs whitespace tokens, per source.
    QueryDef(
      "q46_subword_tokens",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("source"),
          TextAnalysis.subwordTokenCount(col("text")).cast("long").as("st"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("wt"))
        .groupBy(col("source"))
        .agg(sum(col("st")).cast("long").as("subword_tokens"),
          sum(col("wt")).cast("long").as("ws_tokens"),
          (sum(col("st")).cast("double") / sum(col("wt"))).as("ratio"))
        .orderBy(col("source")),
      Some(s"""SELECT source, CAST(SUM(st) AS BIGINT) AS subword_tokens,
              |  CAST(SUM(wt) AS BIGINT) AS ws_tokens,
              |  CAST(SUM(st) AS DOUBLE)/SUM(wt) AS ratio
              |FROM (SELECT source,
              |        len(regexp_extract_all(text, '${TextAnalysis.SubwordPattern}')) AS st,
              |        len(string_split(text,' ')) AS wt
              |      FROM documents)
              |GROUP BY source ORDER BY source""".stripMargin),
    ),


    // Within-doc repetition ratio (duplicate 3-gram fraction) — the
    // Gopher-style boilerplate/spam signal. Map-only integer rationals.
    QueryDef(
      "q47_repetition",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), TextAnalysis.ngramsFromTokens("t", 3).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("total_ngrams"),
          size(array_distinct(col("g"))).cast("long").as("distinct_ngrams"),
          when(size(col("g")) > 0,
            lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
            .otherwise(0.0).as("rep_ratio"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, len(g) AS total_ngrams,
             |  len(list_distinct(g)) AS distinct_ngrams,
             |  CASE WHEN len(g) > 0
             |       THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE)/len(g)
             |       ELSE 0.0 END AS rep_ratio
             |FROM (SELECT doc_id,
             |        [t[i]||' '||t[i+1]||' '||t[i+2]
             |         FOR i IN generate_series(1, len(t)-2)] AS g
             |      FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents))
             |ORDER BY doc_id""".stripMargin),
    ),


    // Benchmark decontamination: training docs sharing any 3-gram with the
    // src0 "benchmark" slice. Benchmark n-grams broadcast; training corpus
    // filtered map-side — no shuffle of text payloads.
    QueryDef(
      "q48_decontaminate",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Dedup.contaminatedDocs(
          docs.where(col("source") =!= "src0"),
          docs.where(col("source") === "src0"),
          "text", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, source,
             |    list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
             |                   FOR i IN generate_series(1, len(t)-2)]) AS gs
             |  FROM (SELECT doc_id, source, string_split(text,' ') AS t FROM documents)),
             |b AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE source = 'src0'),
             |t AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE source != 'src0')
             |SELECT doc_id, COUNT(*) AS matched_ngrams
             |FROM t JOIN b USING (gram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),


    // Exact per-source token-count quantiles via rank positions — integer
    // decisions only, so bit-exact across engines (percentile_cont-style
    // interpolation is not).
    QueryDef(
      "q49_token_quantiles",
      (s, dir) => CorpusStats.exactQuantiles(tbl(s, dir, "documents"), "source",
          TextAnalysis.tokenCount(col("text")), Seq(0.5, 0.9, 0.99))
        .orderBy(col("source")),
      Some("""WITH x AS (SELECT source, len(string_split(text,' ')) AS v FROM documents),
             |r AS (SELECT source, v,
             |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn,
             |        COUNT(*) OVER (PARTITION BY source) AS n FROM x)
             |SELECT source, MAX(n) AS n,
             |  MAX(CASE WHEN rn = ceil(0.5*n) THEN v END) AS p50,
             |  MAX(CASE WHEN rn = ceil(0.9*n) THEN v END) AS p90,
             |  MAX(CASE WHEN rn = ceil(0.99*n) THEN v END) AS p99
             |FROM r GROUP BY source ORDER BY source""".stripMargin),
    ),


    // Lexical commonness: per-doc average token document-frequency (the
    // rational-arithmetic cousin of unigram surprisal — rare-token/garbage
    // docs score low). TF-DF join shape: token-keyed df + doc-keyed rollup.
    QueryDef(
      "q55_commonness",
      (s, dir) => CorpusStats.commonnessScore(tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
             |            FROM documents),
             |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
             |n AS (SELECT COUNT(*) AS total FROM documents)
             |SELECT doc_id, CAST(SUM(df) AS BIGINT) AS df_sum,
             |  COUNT(*) AS n_tokens,
             |  CAST(SUM(df) AS DOUBLE)/(COUNT(*)*(SELECT total FROM n)) AS commonness
             |FROM tok JOIN df USING (w)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),


    // Per-doc lexical diversity (type-token + hapax ratios) — the
    // remaining standard text-quality signal. Integer rationals.
    QueryDef(
      "q59_lexical_diversity",
      (s, dir) => CorpusStats.lexicalDiversity(tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH tf AS (
             |  SELECT doc_id, w, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
             |  GROUP BY doc_id, w)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |  COUNT(*) AS n_types,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |  CAST(COUNT(*) AS DOUBLE)/SUM(c) AS ttr,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)/SUM(c) AS hapax_ratio
             |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),


    // Out-of-vocabulary rate per doc vs a corpus-frequency vocabulary:
    // tokenizer-coverage signal; vocab aggregate broadcast into a map-side
    // membership probe (the corpus never shuffles by token for the probe).
    QueryDef(
      "q65_oov_rate",
      (s, dir) => CorpusStats.oovRate(tbl(s, dir, "documents"),
          "text", "doc_id", minCount = 100L)
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
             |             FROM documents),
             |v AS (SELECT w FROM tok GROUP BY w HAVING COUNT(*) >= 100)
             |SELECT tok.doc_id, COUNT(*) AS n_tokens,
             |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             |    AS oov_rate
             |FROM tok LEFT JOIN v ON tok.w = v.w
             |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin),
    ),


    // Unigram-LM surprisal (CCNet-style perplexity filter) in quarter-bit
    // INTEGER log2 — no libm log anywhere, so even the "approximate"
    // surprisal is bit-exact across engines (the integer-grid rule applied
    // to logarithms). The oracle recomputes the identical quarterLog2
    // formula in SQL.
    QueryDef(
      "q105_lm_surprisal",
      (s, dir) => TextAnalysis.unigramSurprisal(
          tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |tf AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
             |tfq AS (
             |  SELECT w, CASE WHEN length(bin(cnt)) - 1 <= 14
             |    THEN length(bin(cnt*cnt*cnt*cnt)) - 1
             |    ELSE 4 * (length(bin(cnt)) - 15) +
             |         length(bin((cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15)))) - 1 END AS ql
             |  FROM tf),
             |nq AS (
             |  SELECT CASE WHEN length(bin(nt)) - 1 <= 14
             |    THEN length(bin(nt*nt*nt*nt)) - 1
             |    ELSE 4 * (length(bin(nt)) - 15) +
             |         length(bin((nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15)))) - 1 END AS qn
             |  FROM (SELECT COUNT(*) AS nt FROM tok))
             |SELECT doc_id, n_tokens, bits_q4,
             |  CAST(bits_q4 AS DOUBLE) / (n_tokens * 4) AS bits_per_token,
             |  CASE WHEN bits_q4 * 1000 < n_tokens * 19052 THEN 'common'
             |       WHEN bits_q4 * 1000 > n_tokens * 19100 THEN 'rare'
             |       ELSE 'mid' END AS band
             |FROM (
             |  SELECT t.doc_id, COUNT(*) AS n_tokens,
             |    CAST(SUM(nq.qn - f.ql) AS BIGINT) AS bits_q4
             |  FROM tok t JOIN tfq f USING (w), nq
             |  GROUP BY t.doc_id)
             |ORDER BY doc_id""".stripMargin),
    ),


    // Per-source token-distribution Shannon entropy in integer quarter-bits
    // (vocabulary-collapse / generated-spam detector). Σ cnt·(q4(N)−q4(cnt))
    // stays BIGINT; one final division.
    QueryDef(
      "q112_source_entropy",
      (s, dir) => TextAnalysis.tokenEntropy(
          tbl(s, dir, "documents"), "source", "text")
        .withColumnRenamed("grp", "source")
        .orderBy(col("source")),
      Some(s"""WITH tok AS (
              |  SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
              |tf AS (SELECT source, w, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
              |g AS (
              |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
              |    COUNT(*) AS vocab,
              |    CAST(SUM(cnt * (${qlog4Sql("cnt")})) AS BIGINT) AS sum_cq4
              |  FROM tf GROUP BY source)
              |SELECT source, n_tokens, vocab,
              |  n_tokens * (${qlog4Sql("n_tokens")}) - sum_cq4 AS ent_q4,
              |  CAST(n_tokens * (${qlog4Sql("n_tokens")}) - sum_cq4 AS DOUBLE)
              |    / (n_tokens * 4) AS entropy_bits
              |FROM g ORDER BY source""".stripMargin),
    ),


    // Gopher quality rules: five integer-decided heuristic flags + the
    // conjunction, per doc — the audit-friendly form (WHY was it dropped,
    // not just that it was). Splits non-degenerately on this corpus
    // (226/500 keep at sf0.01).
    QueryDef(
      "q113_gopher_rules",
      (s, dir) => TextAnalysis.gopherRules(
          tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text,' ') AS toks,
             |    length(text) AS chars FROM documents),
             |f AS (
             |  SELECT doc_id, len(toks) AS wc,
             |    chars - (len(toks) - 1) AS cw,
             |    len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
             |    len(list_distinct(toks)) AS vocab,
             |    len(list_filter(list_distinct(toks),
             |        w -> w IN ('the','a','and','of','to','in','is','for','on','with'))) AS sw
             |  FROM t)
             |SELECT doc_id, CAST(wc AS BIGINT) AS wc,
             |  wc BETWEEN 50 AND 100000 AS wc_ok,
             |  cw >= 3*wc AND cw <= 10*wc AS wordlen_ok,
             |  alpha*5 > wc*4 AS alpha_ok,
             |  sw >= 2 AS stopword_ok,
             |  vocab*10 >= wc*3 AS ttr_ok,
             |  (wc BETWEEN 50 AND 100000) AND cw >= 3*wc AND cw <= 10*wc
             |    AND alpha*5 > wc*4 AND sw >= 2 AND vocab*10 >= wc*3 AS keep
             |FROM f ORDER BY doc_id""".stripMargin),
    ),


    // The composed curation FUNNEL (q113 Gopher gates ∘ q107 CCNet band ∘
    // exact dedup) with per-stage per-source attrition accounting — the
    // report a data team reviews before a training run. One oracle checks
    // the whole composition end-to-end.
    QueryDef(
      "q114_curation_funnel",
      (s, dir) => Curation.curationFunnel(
          tbl(s, dir, "documents"), "text", "doc_id", "source")
        .orderBy(col("source")),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |tf AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
             |tfq AS (
             |  SELECT w, CASE WHEN length(bin(cnt)) - 1 <= 14
             |    THEN length(bin(cnt*cnt*cnt*cnt)) - 1
             |    ELSE 4 * (length(bin(cnt)) - 15) +
             |         length(bin((cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15))
             |                   *(cnt >> (length(bin(cnt)) - 15)))) - 1 END AS ql
             |  FROM tf),
             |nq AS (
             |  SELECT CASE WHEN length(bin(nt)) - 1 <= 14
             |    THEN length(bin(nt*nt*nt*nt)) - 1
             |    ELSE 4 * (length(bin(nt)) - 15) +
             |         length(bin((nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15))
             |                   *(nt >> (length(bin(nt)) - 15)))) - 1 END AS qn
             |  FROM (SELECT COUNT(*) AS nt FROM tok)),
             |d AS (
             |  SELECT t.doc_id, COUNT(*) AS n,
             |    CAST(SUM(nq.qn - f.ql) AS BIGINT) AS bits_q4
             |  FROM tok t JOIN tfq f USING (w), nq GROUP BY t.doc_id),
             |sbin AS (
             |  SELECT d.doc_id, doc.source, (bits_q4 * 64) // (n * 4) AS bin
             |  FROM d JOIN documents doc USING (doc_id)),
             |bb AS (SELECT source, bin, COUNT(*) AS cnt FROM sbin GROUP BY 1, 2),
             |cc AS (
             |  SELECT source, bin, cnt,
             |    SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
             |    SUM(cnt) OVER (PARTITION BY source) AS n
             |  FROM bb),
             |cuts AS (
             |  SELECT source,
             |    MIN(CASE WHEN cum >= (n * 25 + 99) // 100 THEN bin END) AS b_lo,
             |    MIN(CASE WHEN cum >= (n * 75 + 99) // 100 THEN bin END) AS b_hi
             |  FROM cc GROUP BY source),
             |band AS (
             |  SELECT sbin.doc_id, sbin.bin BETWEEN cuts.b_lo AND cuts.b_hi AS b_keep
             |  FROM sbin JOIN cuts USING (source)),
             |gt AS (
             |  SELECT doc_id, string_split(text,' ') AS toks,
             |    length(text) AS chars FROM documents),
             |gf AS (
             |  SELECT doc_id, len(toks) AS wc, chars - (len(toks) - 1) AS cw,
             |    len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
             |    len(list_distinct(toks)) AS vocab,
             |    len(list_filter(list_distinct(toks),
             |        w -> w IN ('the','a','and','of','to','in','is','for','on','with'))) AS sw
             |  FROM gt),
             |g AS (
             |  SELECT doc_id,
             |    (wc BETWEEN 50 AND 100000) AND cw >= 3*wc AND cw <= 10*wc
             |      AND alpha*5 > wc*4 AND sw >= 2 AND vocab*10 >= wc*3 AS g_keep
             |  FROM gf),
             |staged AS (
             |  SELECT doc.doc_id, doc.source, doc.text,
             |    CAST(len(string_split(doc.text,' ')) AS BIGINT) AS n_tok,
             |    g.g_keep, band.b_keep
             |  FROM documents doc JOIN g USING (doc_id) JOIN band USING (doc_id)),
             |pool AS (SELECT * FROM staged WHERE g_keep AND b_keep),
             |mins AS (SELECT text AS t, MIN(doc_id) AS keep_id FROM pool GROUP BY text),
             |pf AS (
             |  SELECT p.*, p.doc_id = m.keep_id AS is_surv
             |  FROM pool p JOIN mins m ON p.text = m.t),
             |gates AS (
             |  SELECT source, COUNT(*) AS total_docs,
             |    CAST(SUM(CASE WHEN NOT g_keep THEN 1 ELSE 0 END) AS BIGINT) AS dropped_gopher,
             |    CAST(SUM(CASE WHEN g_keep AND NOT b_keep THEN 1 ELSE 0 END) AS BIGINT) AS dropped_band
             |  FROM staged GROUP BY source),
             |y AS (
             |  SELECT source, COUNT(*) AS pool_docs,
             |    CAST(SUM(CASE WHEN is_surv THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
             |    CAST(SUM(CASE WHEN is_surv THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
             |  FROM pf GROUP BY source)
             |SELECT gates.source, gates.total_docs, gates.dropped_gopher,
             |  gates.dropped_band,
             |  COALESCE(y.pool_docs, 0) - COALESCE(y.kept_docs, 0) AS dropped_dup,
             |  COALESCE(y.kept_docs, 0) AS kept_docs,
             |  COALESCE(y.kept_tokens, 0) AS kept_tokens
             |FROM gates LEFT JOIN y USING (source) ORDER BY source""".stripMargin),
    ),


    // EXACT subword tokenization (greedy longest-match over a merges
    // vocabulary — WordPiece inference with single-char fallback), the
    // precise counterpart to q46's regex ESTIMATOR for token-budget math.
    // Map-only with the merges as closure-held model state; the oracle
    // replays the same greedy loop as a recursive CTE over the same
    // vocabulary literals (the RhpSig interpolate-the-model pattern).
    QueryDef(
      "q117_wordpiece_counts",
      (s, dir) => Tokenize.wordpieceCounts(s, tbl(s, dir, "documents"),
          "text", "doc_id")
        .toDF().orderBy(col("doc_id")),
      Some(Tokenize.oracleSqlFor(Tokenize.DefaultMerges)),
    ),


    // Linear quality-classifier inference (the fastText-filter shape):
    // integer token weights + bias, margin summed over tokens with
    // multiplicity, keep iff margin > 0 — map-only model scoring whose
    // every decision is bit-exact (the oracle re-derives margins from the
    // same VALUES weight table).
    {
      val weights = Curation.DemoWeights
      val bias = Curation.DemoBias
      val valuesSql = Curation.demoWeightsValuesSql
      QueryDef(
        "q122_quality_classifier",
        (s, dir) => Curation.linearGate(tbl(s, dir, "documents"),
            "text", "doc_id", weights.toMap, bias)
          .orderBy(col("doc_id")),
        Some(s"""WITH w(tok, wt) AS (SELECT * FROM (VALUES $valuesSql)),
                |t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                |      FROM documents),
                |m AS (SELECT t.doc_id,
                |        CAST($bias + COALESCE(SUM(w.wt), 0) AS BIGINT) AS margin
                |      FROM t LEFT JOIN w USING (tok) GROUP BY t.doc_id)
                |SELECT doc_id, margin, margin > 0 AS keep
                |FROM m ORDER BY doc_id""".stripMargin),
      )
    },


    // Eval-set decontamination: per-doc benchmark n-gram overlap + the
    // contamination flag — the screen every pretraining corpus runs
    // against its held-out evals. Eval set = docs with doc_id % 29 == 0
    // (deterministic, benchmark-sized); corpus = the rest. Engine probes
    // int64 gram hashes against a BROADCAST eval gram set (map-side BHJ,
    // no corpus shuffle); the oracle recomputes the same overlap on gram
    // strings (counts agree modulo the documented 2^-64 collision bound,
    // as q24/q26).
    QueryDef(
      "q125_decontamination",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Curation.evalContamination(
          docs.where(col("doc_id") % 29 =!= 0),
          docs.where(col("doc_id") % 29 === 0),
          "text", "doc_id", k = 3, thresholdPpm = 500000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 29 = 0),
             |dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 29 <> 0),
             |agg AS (
             |  SELECT dg.doc_id, COUNT(*) AS n_grams,
             |    CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
             |  FROM dg LEFT JOIN ev ON dg.g = ev.g
             |  GROUP BY dg.doc_id)
             |SELECT doc_id, n_grams, n_hit,
             |  (n_hit * 1000000) // n_grams AS overlap_ppm,
             |  (n_hit * 1000000) // n_grams >= 500000 AS contaminated
             |FROM agg ORDER BY doc_id""".stripMargin),
    ),


    // BPE TRAINING statistic (q117 is the inference side): corpus-wide
    // adjacent-character pair counts weighted by word frequency — the
    // quantity each merge step maximizes. Pair explosion runs over
    // DISTINCT words (vocabulary-bounded, not corpus-bounded); both
    // rollups partial-agg; top-k is TakeOrderedAndProject.
    QueryDef(
      "q130_bpe_pairs",
      (s, dir) => Tokenize.bpePairCounts(tbl(s, dir, "documents"), "text", topK = 20),
      Some("""WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM documents),
             |wc AS (SELECT word, COUNT(*) AS cnt FROM w WHERE len(word) >= 2 GROUP BY word),
             |p AS (SELECT substring(word, i, 1) || ' ' || substring(word, i+1, 1) AS pair, cnt
             |      FROM (SELECT word, cnt, unnest(generate_series(1, len(word)-1)) AS i FROM wc)),
             |a AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM p GROUP BY pair)
             |SELECT pair, cnt FROM a ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),
    ),


    // Exact BPE ENCODING under a ranked merge table — the GPT-2-family
    // tokenizer loop (q130 = the training statistic, q117 = longest-match
    // inference; this is ranked-merge inference where merge ORDER decides
    // the split). The merge loop runs once per DISTINCT word; the oracle
    // replays the identical recurrence as a recursive CTE with the rank
    // list interpolated as a literal (single model source of truth).
    QueryDef(
      "q134_bpe_encode",
      (s, dir) => Tokenize.bpeCounts(s, tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some(Tokenize.bpeOracleSql(Tokenize.DefaultRankedMerges)),
    ),


    // Vocabulary-shift monitor: per-token Laplace-smoothed log-odds of
    // src0 vs the rest of the corpus in quarter-bit integer log2 — which
    // words this source over/under-uses, bit-exact cross-engine (the q105
    // integer-log discipline on relative frequency).
    QueryDef(
      "q150_token_logodds",
      (s, dir) => TextAnalysis.tokenLogOdds(
          tbl(s, dir, "documents"), "text", "source", "src0")
        .orderBy(col("lor_q").desc, col("w")),
      Some({
        val a = "(c.cnt_a + 1) * (t.tot_b + t.v)"
        val b = "(c.cnt_b + 1) * (t.tot_a + t.v)"
        s"""WITH tok AS (
           |  SELECT (source = 'src0') AS is_a, unnest(string_split(text,' ')) AS w
           |  FROM documents),
           |c AS (
           |  SELECT w,
           |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
           |  FROM tok GROUP BY w),
           |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS tot_a,
           |             CAST(SUM(cnt_b) AS BIGINT) AS tot_b,
           |             COUNT(*) AS v FROM c)
           |SELECT c.w, c.cnt_a, c.cnt_b,
           |  CAST((${qlog4Sql(a)}) - (${qlog4Sql(b)}) AS BIGINT) AS lor_q
           |FROM c, t ORDER BY lor_q DESC, w""".stripMargin
      }),
    ),


    // IDF-weighted exact Jaccard pairs (>= 0.8 weighted) on the 10% audit
    // sample: boilerplate-down-weighted near-dup where shared RARE tokens
    // dominate — integer quarter-bit idf, integer ppm threshold, zero
    // float. Candidates via the inverted-index token join, cost bounded
    // by the sample.
    QueryDef(
      "q151_weighted_jaccard",
      (s, dir) => Dedup.idfWeightedJaccardPairs(tbl(s, dir, "documents"),
          "text", "doc_id", thresholdPpm = 800000L, sampleNum = 1, sampleDenom = 10)
        .orderBy(col("a_id"), col("b_id")),
      Some({
        val qn = qlog4Sql("n.nd")
        val qd = qlog4Sql("dfc.df")
        s"""WITH d AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
           |             AS BIGINT) % 10 < 1),
           |tok AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS w FROM d),
           |n AS (SELECT COUNT(*) AS nd FROM d),
           |dfc AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
           |idf AS (SELECT w, CAST(($qn) - ($qd) + 1 AS BIGINT) AS idf FROM dfc, n),
           |wtok AS (SELECT t.doc_id, t.w, i.idf FROM tok t JOIN idf i ON t.w = i.w),
           |docw AS (SELECT doc_id, CAST(SUM(idf) AS BIGINT) AS wt FROM wtok GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(SUM(a.idf) AS BIGINT) AS inter_w
           |  FROM wtok a JOIN wtok b ON a.w = b.w AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |j AS (
           |  SELECT i.a_id, i.b_id, i.inter_w, wa.wt + wb.wt - i.inter_w AS union_w
           |  FROM inter i JOIN docw wa ON wa.doc_id = i.a_id
           |  JOIN docw wb ON wb.doc_id = i.b_id)
           |SELECT a_id, b_id, inter_w, union_w,
           |  (inter_w * 1000000) // union_w AS wj_ppm
           |FROM j WHERE (inter_w * 1000000) // union_w >= 800000
           |ORDER BY a_id, b_id""".stripMargin
      }),
    ),


    // Overlapping sliding-window chunks (window 32, stride 24 — 25%
    // overlap): the RAG windowing convention; every token covered, no
    // fully-redundant tail. Map-only; md5 fingerprints make content
    // checkable without shipping text.
    QueryDef(
      "q156_stride_chunks",
      (s, dir) => Packing.strideChunks(tbl(s, dir, "documents"),
          "text", "doc_id", window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |c AS (
             |  SELECT doc_id, toks, len(toks) AS n,
             |    CASE WHEN len(toks) <= 32 THEN 1
             |         ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
             |  FROM t WHERE len(toks) > 0)
             |SELECT doc_id, i AS chunk_id, i * 24 AS start,
             |  LEAST(n - i * 24, 32) AS chunk_tokens,
             |  md5(array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ')) AS chunk_md5
             |FROM c, unnest(generate_series(0, n_chunks - 1)) u(i)
             |ORDER BY doc_id, chunk_id""".stripMargin),
    ),


    // Vocabulary KL drift per source vs the rest: one integer quarter-bit
    // drift scalar per source (the magnitude rollup over q150's per-token
    // log-odds), Laplace-smoothed over the sources x vocab dense frame.
    // Clamped-at-zero before the ppm division (Spark div truncates,
    // DuckDB // floors — negatives would diverge).
    QueryDef(
      "q158_vocab_kl_drift",
      (s, dir) => TextAnalysis.vocabKlDrift(
          tbl(s, dir, "documents"), "text", "source")
        .orderBy(col("source")),
      Some({
        val qa = qlog4Sql("(d.ca + 1) * st.nb")
        val qb = qlog4Sql("(d.cb + 1) * st.na")
        s"""WITH tok AS (
           |  SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
           |c AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
           |tot AS (SELECT w, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY w),
           |d AS (
           |  SELECT s.source, tot.w, tot.t,
           |    CAST(COALESCE(c.c, 0) AS BIGINT) AS ca,
           |    CAST(tot.t - COALESCE(c.c, 0) AS BIGINT) AS cb
           |  FROM (SELECT DISTINCT source FROM c) s
           |  CROSS JOIN tot
           |  LEFT JOIN c ON c.source = s.source AND c.w = tot.w),
           |st AS (
           |  SELECT source, CAST(SUM(ca) AS BIGINT) AS n_tokens,
           |    COUNT(*) AS vocab,
           |    CAST(SUM(ca + 1) AS BIGINT) AS na,
           |    CAST(SUM(cb + 1) AS BIGINT) AS nb
           |  FROM d GROUP BY source)
           |SELECT d.source, st.n_tokens, st.vocab,
           |  CAST(SUM((d.ca + 1) * (($qa) - ($qb))) AS BIGINT) AS kl_q4,
           |  (GREATEST(CAST(SUM((d.ca + 1) * (($qa) - ($qb))) AS BIGINT), 0) * 1000)
           |    // st.na AS kl_mq4
           |FROM d JOIN st ON d.source = st.source
           |GROUP BY d.source, st.n_tokens, st.vocab, st.na
           |ORDER BY d.source""".stripMargin
      }),
    ),


    // Vocabulary growth curve per source (Heaps-law saturation audit):
    // token and TYPE accumulation at every-64-docs checkpoints in
    // deterministic doc order — a flattening types curve says the source
    // is mined out. Type novelty is ONE (source, token) min-rank
    // aggregate; cumulative sums run over source x bucket metadata rows.
    QueryDef(
      "q165_vocab_growth",
      (s, dir) => CorpusStats.vocabGrowth(tbl(s, dir, "documents"),
          "text", "source", "doc_id", step = 64)
        .orderBy(col("source"), col("checkpoint")),
      Some("""WITH r AS (
             |  SELECT source, doc_id, string_split(text,' ') AS toks,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rnk
             |  FROM documents),
             |pb AS (
             |  SELECT source, (rnk + 63) // 64 AS bkt, MAX(rnk) AS docs_partial,
             |    CAST(SUM(len(toks)) AS BIGINT) AS tok_partial
             |  FROM r GROUP BY 1, 2),
             |fr AS (
             |  SELECT source, w, MIN(rnk) AS fr
             |  FROM (SELECT source, rnk, unnest(toks) AS w FROM r) GROUP BY 1, 2),
             |nt AS (
             |  SELECT source, (fr + 63) // 64 AS bkt, COUNT(*) AS new_types
             |  FROM fr GROUP BY 1, 2)
             |SELECT pb.source, pb.bkt * 64 AS checkpoint,
             |  docs_partial AS docs_seen,
             |  CAST(SUM(tok_partial) OVER (PARTITION BY pb.source ORDER BY pb.bkt) AS BIGINT) AS tokens_seen,
             |  CAST(SUM(COALESCE(new_types, 0)) OVER (PARTITION BY pb.source ORDER BY pb.bkt) AS BIGINT) AS vocab_seen
             |FROM pb LEFT JOIN nt ON nt.source = pb.source AND nt.bkt = pb.bkt
             |ORDER BY pb.source, checkpoint""".stripMargin),
    ),


    // Per-doc CORPUS-hapax share: fraction of a doc's tokens that occur
    // exactly once across ALL docs — cross-document novelty/noise, the
    // complement of q59's within-doc hapax ratio. Integer ppm.
    QueryDef(
      "q166_corpus_hapax",
      (s, dir) => CorpusStats.corpusHapaxShare(tbl(s, dir, "documents"),
          "text", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |cc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |  (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             |    // COUNT(*) AS hapax_ppm
             |FROM tok JOIN cc USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),


    // Cross-document repeated chunks: q156's stride-chunk fingerprints
    // rolled up to the chunks appearing 2+ times — the RAG-index dedup
    // pass (don't embed the same boilerplate chunk 40 times) at chunk
    // rather than span granularity (q83's complement on the retrieval
    // side). Digest-keyed rollup; text never reshuffles.
    QueryDef(
      "q167_repeated_chunks",
      (s, dir) => Packing.strideChunks(tbl(s, dir, "documents"),
          "text", "doc_id", window = 32, stride = 24)
        .groupBy(col("chunk_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"), min(col("doc_id")).as("first_doc"))
        .where(col("n_occ") >= 2)
        .orderBy(col("chunk_md5")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |c AS (
             |  SELECT doc_id, toks, len(toks) AS n,
             |    CASE WHEN len(toks) <= 32 THEN 1
             |         ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
             |  FROM t WHERE len(toks) > 0),
             |ch AS (
             |  SELECT doc_id, md5(array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ')) AS chunk_md5
             |  FROM c, unnest(generate_series(0, n_chunks - 1)) u(i))
             |SELECT chunk_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  COUNT(*) AS n_occ, MIN(doc_id) AS first_doc
             |FROM ch GROUP BY chunk_md5 HAVING COUNT(*) >= 2
             |ORDER BY chunk_md5""".stripMargin),
    ),


    // Directional cross-entropy transfer matrix: H(a -> b) = each
    // source's tokens scored under every OTHER source's Laplace-smoothed
    // unigram LM, quarter-bit integers — low H(a -> b) means b already
    // models a (transfer value / redundancy). Terms only where ca > 0,
    // so the frame is counts x sources, no dense fill.
    QueryDef(
      "q184_cross_entropy",
      (s, dir) => TextAnalysis.crossEntropyMatrix(
          tbl(s, dir, "documents"), "text", "source")
        .orderBy(col("src_a"), col("src_b")),
      Some({
        val qn = qlog4Sql("sb.n + v.v")
        val qc = qlog4Sql("COALESCE(cb.c, 0) + 1")
        s"""WITH tok AS (
           |  SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
           |c AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
           |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM c),
           |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source)
           |SELECT a.source AS src_a, sb.source AS src_b,
           |  CAST(SUM(a.c) AS BIGINT) AS n_tokens_a,
           |  CAST(SUM(a.c * (($qn) - ($qc))) AS BIGINT) AS ce_q4,
           |  (CAST(SUM(a.c * (($qn) - ($qc))) AS BIGINT) * 1000)
           |    // CAST(SUM(a.c) AS BIGINT) AS ce_mq4
           |FROM c a
           |JOIN st sb ON sb.source <> a.source
           |LEFT JOIN c cb ON cb.source = sb.source AND cb.w = a.w
           |CROSS JOIN v
           |GROUP BY a.source, sb.source
           |ORDER BY src_a, src_b""".stripMargin
      }),
    ),


    // Language confusion matrix: declared `lang` column × q31's detected
    // language, with per-cell counts and the per-declared-language
    // agreement share — the metadata-trust audit (mislabeled language is
    // a leading cause of filter misfires in multilingual corpora). One
    // map-only detection pass + a cells rollup with a broadcast margin.
    QueryDef(
      "q230_lang_confusion",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("lang"),
            TextAnalysis.langPred(TextAnalysis.stopwordRatio(col("text")))
              .as("detected"))
        val cells = PinnedCache.pin(d.groupBy(col("lang"), col("detected"))
          .agg(count(lit(1)).as("n")))
        val margins = cells.groupBy(col("lang")).agg(sum(col("n")).as("row_n"))
        cells.join(broadcast(margins), Seq("lang"))
          .select(col("lang"), col("detected"), col("n"),
            expr("(n * 1000000) div row_n").as("cell_ppm"))
          .orderBy(col("lang"), col("detected"))
      },
      Some(s"""WITH d AS (
              |  SELECT lang,
              |    CASE WHEN score >= 0.05 THEN 'en' WHEN score > 0 THEN 'mixed'
              |         ELSE 'other' END AS detected
              |  FROM (SELECT lang,
              |          CAST(len(list_filter(string_split(text,' '),
              |               w -> w IN (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)
              |          / len(string_split(text,' ')) AS score
              |        FROM documents)),
              |cells AS (SELECT lang, detected, COUNT(*) AS n FROM d GROUP BY 1, 2),
              |m AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM cells GROUP BY 1)
              |SELECT cells.lang, detected, CAST(n AS BIGINT) AS n,
              |  CAST((n * 1000000) // row_n AS BIGINT) AS cell_ppm
              |FROM cells JOIN m ON m.lang = cells.lang
              |ORDER BY cells.lang, detected""".stripMargin),
    ),


    // Orthography profile per source: share of uppercase-initial,
    // all-caps, numeric, and punctuation-bearing tokens — the cheap
    // style fingerprint separating prose from listings/code/shouting.
    // Map-only regex counts, integer ppm.
    QueryDef(
      "q232_orthography",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("w").rlike("^[A-Z]"), 1L).otherwise(0L)).as("n_cap"),
          sum(when(col("w").rlike("^[A-Z0-9]+$"), 1L).otherwise(0L)).as("n_allcaps"),
          sum(when(col("w").rlike("^[0-9]+$"), 1L).otherwise(0L)).as("n_numeric"),
          sum(when(col("w").rlike("[^A-Za-z0-9]"), 1L).otherwise(0L)).as("n_punct"))
        .select(col("source"), col("n_tokens"),
          expr("(n_cap * 1000000) div n_tokens").as("cap_ppm"),
          expr("(n_allcaps * 1000000) div n_tokens").as("allcaps_ppm"),
          expr("(n_numeric * 1000000) div n_tokens").as("numeric_ppm"),
          expr("(n_punct * 1000000) div n_tokens").as("punct_ppm"))
        .orderBy(col("source")),
      Some("""WITH t AS (
             |  SELECT source, unnest(string_split(text,' ')) AS w FROM documents),
             |a AS (
             |  SELECT source, COUNT(*) AS n_tokens,
             |    CAST(SUM(CASE WHEN regexp_matches(w, '^[A-Z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_cap,
             |    CAST(SUM(CASE WHEN regexp_matches(w, '^[A-Z0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_allcaps,
             |    CAST(SUM(CASE WHEN regexp_matches(w, '^[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
             |    CAST(SUM(CASE WHEN regexp_matches(w, '[^A-Za-z0-9]') THEN 1 ELSE 0 END) AS BIGINT) AS n_punct
             |  FROM t GROUP BY source)
             |SELECT source, n_tokens,
             |  CAST((n_cap * 1000000) // n_tokens AS BIGINT) AS cap_ppm,
             |  CAST((n_allcaps * 1000000) // n_tokens AS BIGINT) AS allcaps_ppm,
             |  CAST((n_numeric * 1000000) // n_tokens AS BIGINT) AS numeric_ppm,
             |  CAST((n_punct * 1000000) // n_tokens AS BIGINT) AS punct_ppm
             |FROM a ORDER BY source""".stripMargin),
    ),


    // Trending tokens: each token's hottest week vs its own all-time
    // rate — spike_ppm = (max weekly count · n_weeks · 10⁶) div total
    // (10⁶ = flat usage; ≫ 10⁶ = a spike week). Top 20 by (spike, count
    // desc, token) among tokens seen ≥ 20 times, ties totally ordered.
    // The event-props trend mirror of q150's corpus drift.
    QueryDef(
      "q240_trending_tokens",
      (s, dir) => {
        // documents carry no timestamp: the "week" is the doc_id stripe
        // (stable, deterministic) — the operator shape is what matters
        val toks = tbl(s, dir, "documents")
          .select(expr("doc_id div 100").as("stripe"),
            explode(split(col("text"), " ")).as("w"))
        val cells = PinnedCache.pin(toks.groupBy(col("w"), col("stripe"))
          .agg(count(lit(1)).as("c")))
        val tot = cells.groupBy(col("w"))
          .agg(sum(col("c")).as("total"), count(lit(1)).as("n_stripes_seen"),
            max(col("c")).as("max_c"))
        val nStripes = toks.select(col("stripe")).distinct().count()
        tot.where(col("total") >= 20)
          .select(col("w"), col("total"), col("max_c"),
            expr(s"(max_c * ${nStripes}L * 1000000) div total").as("spike_ppm"))
          .orderBy(col("spike_ppm").desc, col("total").desc, col("w"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id // 100 AS stripe, unnest(string_split(text,' ')) AS w
             |  FROM documents),
             |cells AS (SELECT w, stripe, COUNT(*) AS c FROM toks GROUP BY 1, 2),
             |ns AS (SELECT COUNT(DISTINCT stripe) AS n FROM toks),
             |t AS (
             |  SELECT w, CAST(SUM(c) AS BIGINT) AS total, MAX(c) AS max_c
             |  FROM cells GROUP BY w)
             |SELECT w, total, CAST(max_c AS BIGINT) AS max_c,
             |  CAST((max_c * (SELECT n FROM ns) * 1000000) // total AS BIGINT)
             |    AS spike_ppm
             |FROM t WHERE total >= 20
             |ORDER BY spike_ppm DESC, total DESC, w LIMIT 20""".stripMargin),
    ),


    // Vocabulary turnover between consecutive corpus stripes: exact
    // Jaccard of adjacent stripes' vocabularies (intersection via one
    // token-keyed self-join of the distinct (stripe, token) rollup) —
    // the corpus-evolution dial: low turnover = stable domain, cliffs =
    // a source/topic boundary. All integer (sizes + ppm).
    QueryDef(
      "q241_vocab_turnover",
      (s, dir) => {
        val sv = PinnedCache.pin(tbl(s, dir, "documents")
          .select(expr("doc_id div 100").as("stripe"),
            explode(split(col("text"), " ")).as("w")).distinct())
        val sizes = sv.groupBy(col("stripe")).agg(count(lit(1)).as("vocab"))
        val inter = sv.as("a")
          .join(sv.select((col("stripe") - 1).as("stripe"), col("w")).as("b"),
            Seq("stripe", "w"))
          .groupBy(col("stripe")).agg(count(lit(1)).as("inter"))
        sizes.as("s1")
          .join(sizes.select((col("stripe") - 1).as("stripe"),
            col("vocab").as("vocab_next")).as("s2"), Seq("stripe"))
          .join(inter, Seq("stripe"), "left_outer")
          .select(col("stripe"), col("vocab"), col("vocab_next"),
            coalesce(col("inter"), lit(0L)).as("inter"),
            expr("(coalesce(inter, 0L) * 1000000) div (vocab + vocab_next - coalesce(inter, 0L))")
              .as("jaccard_ppm"))
          .orderBy(col("stripe"))
      },
      Some("""WITH sv AS MATERIALIZED (
             |  SELECT DISTINCT doc_id // 100 AS stripe,
             |    unnest(string_split(text,' ')) AS w
             |  FROM documents),
             |sz AS (SELECT stripe, COUNT(*) AS vocab FROM sv GROUP BY 1),
             |iv AS (
             |  SELECT a.stripe, COUNT(*) AS inter
             |  FROM sv a JOIN sv b ON b.stripe = a.stripe + 1 AND b.w = a.w
             |  GROUP BY a.stripe)
             |SELECT s1.stripe, s1.vocab, s2.vocab AS vocab_next,
             |  COALESCE(iv.inter, 0) AS inter,
             |  CAST((COALESCE(iv.inter, 0) * 1000000)
             |    // (s1.vocab + s2.vocab - COALESCE(iv.inter, 0)) AS BIGINT)
             |    AS jaccard_ppm
             |FROM sz s1
             |JOIN sz s2 ON s2.stripe = s1.stripe + 1
             |LEFT JOIN iv ON iv.stripe = s1.stripe
             |ORDER BY s1.stripe""".stripMargin),
    ),


    // Biggest-mover tokens between the corpus halves: frequency rank in
    // the first doc_id half vs the second, top 15 by absolute rank shift
    // (ties totally ordered) among tokens present in both — the
    // discrete, rank-space cousin of q150's log-odds drift.
    QueryDef(
      "q242_rank_movers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = PinnedCache.pin(tbl(s, dir, "documents"))
        val mid = d.agg(expr("(min(doc_id) + max(doc_id)) div 2").as("m")).head.getLong(0)
        val cnt = d
          .select(when(col("doc_id") <= mid, "h1").otherwise("h2").as("half"),
            explode(split(col("text"), " ")).as("w"))
          .groupBy(col("half"), col("w")).agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("half"))
          .orderBy(col("c").desc, col("w"))
        val ranked = cnt.withColumn("rk", row_number().over(w).cast("long"))
        ranked.where(col("half") === "h1")
          .select(col("w"), col("rk").as("rank_h1"))
          .join(ranked.where(col("half") === "h2")
            .select(col("w"), col("rk").as("rank_h2")), Seq("w"))
          .select(col("w"), col("rank_h1"), col("rank_h2"),
            abs(col("rank_h1") - col("rank_h2")).as("shift"))
          .orderBy(col("shift").desc, col("rank_h1"), col("w"))
          .limit(15)
      },
      Some("""WITH mid AS (
             |  SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
             |cnt AS (
             |  SELECT CASE WHEN doc_id <= (SELECT m FROM mid) THEN 'h1'
             |              ELSE 'h2' END AS half,
             |    unnest(string_split(text,' ')) AS w
             |  FROM documents),
             |c2 AS (SELECT half, w, COUNT(*) AS c FROM cnt GROUP BY 1, 2),
             |rk AS (
             |  SELECT half, w,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY half
             |      ORDER BY c DESC, w) AS BIGINT) AS rk
             |  FROM c2)
             |SELECT a.w, a.rk AS rank_h1, b.rk AS rank_h2,
             |  abs(a.rk - b.rk) AS shift
             |FROM rk a JOIN rk b ON b.w = a.w AND a.half = 'h1' AND b.half = 'h2'
             |ORDER BY shift DESC, rank_h1, a.w LIMIT 15""".stripMargin),
    ),


    // Tokenizer fertility by source: exact wordpiece subwords per word
    // (q117's greedy longest-match inference rolled up per source) — the
    // "how expensive is this source under our tokenizer" planning number
    // (high fertility = rare/OOV-heavy text fragmenting into chars).
    // Integer ppm; the oracle replays the same greedy loop as a
    // recursive CTE and rolls it up.
    QueryDef(
      "q243_bpe_fertility",
      (s, dir) => {
        val per = Tokenize.wordpieceCounts(s, tbl(s, dir, "documents"),
          "text", "doc_id").toDF()
        per.join(tbl(s, dir, "documents").select(col("doc_id"), col("source")),
            "doc_id")
          .groupBy(col("source"))
          .agg(sum(col("n_words")).as("n_words"),
            sum(col("n_subwords")).as("n_subwords"))
          .select(col("source"), col("n_words"), col("n_subwords"),
            expr("(n_subwords * 1000000) div n_words").as("fertility_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val whens = Tokenize.greedyCaseWhens(Tokenize.DefaultMerges)
        s"""WITH RECURSIVE w AS (
           |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
           |steps AS (
           |  SELECT doc_id, w, 1 AS pos, 0 AS n FROM w
           |  UNION ALL
           |  SELECT doc_id, w,
           |    pos + CASE
           |$whens
           |      ELSE 1 END,
           |    n + 1
           |  FROM steps WHERE pos <= len(w)),
           |perdoc AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |    CAST(SUM(n) AS BIGINT) AS n_subwords
           |  FROM steps WHERE pos > len(w)
           |  GROUP BY doc_id)
           |SELECT d.source, CAST(SUM(p.n_words) AS BIGINT) AS n_words,
           |  CAST(SUM(p.n_subwords) AS BIGINT) AS n_subwords,
           |  CAST((SUM(p.n_subwords) * 1000000) // SUM(p.n_words) AS BIGINT)
           |    AS fertility_ppm
           |FROM perdoc p JOIN documents d USING (doc_id)
           |GROUP BY d.source ORDER BY d.source""".stripMargin
      },
    ),


    // Lexical-complexity (readability) profile per (source, lang): the
    // syllable-side terms of Flesch/FOG with the classic vowel-group
    // heuristic (a syllable ≈ one maximal [aeiouy]+ run), all integer —
    // pooled syllables-per-word ppk, FOG complex-word (>= 3 vowel groups)
    // ppm, and the Flesch syllable term 84600·syl div words in milli
    // units. (The corpus has no sentence punctuation — verified — so the
    // words-per-sentence term is degenerate and deliberately excluded.)
    // Map-only per-doc counting + one small-keyed rollup. Scales.
    QueryDef(
      "q249_readability_profile",
      (s, dir) => {
        val per = tbl(s, dir, "documents").select(col("source"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("w"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
            .cast("long").as("y"),
          expr("cast(size(filter(split(text, ' '), " +
            "wd -> size(regexp_extract_all(lower(wd), '[aeiouy]+', 0)) >= 3)) as bigint)")
            .as("cx"))
        per.groupBy("source", "lang")
          .agg(count(lit(1)).as("docs"), sum(col("w")).as("words"),
            sum(col("y")).as("syllables"), sum(col("cx")).as("complex_words"))
          .select(col("source"), col("lang"), col("docs"), col("words"),
            col("syllables"), col("complex_words"),
            expr("(syllables * 1000) div words").as("spw_ppk"),
            expr("(complex_words * 1000000) div words").as("complex_ppm"),
            expr("(84600 * syllables) div words").as("flesch_syll_milli"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH per AS (
             |  SELECT source, lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      wd -> len(regexp_extract_all(lower(wd), '[aeiouy]+')) >= 3)) AS BIGINT) AS cx
             |  FROM documents)
             |SELECT source, lang, COUNT(*)::BIGINT AS docs,
             |  CAST(SUM(w) AS BIGINT) AS words,
             |  CAST(SUM(y) AS BIGINT) AS syllables,
             |  CAST(SUM(cx) AS BIGINT) AS complex_words,
             |  CAST((SUM(y) * 1000) // SUM(w) AS BIGINT) AS spw_ppk,
             |  CAST((SUM(cx) * 1000000) // SUM(w) AS BIGINT) AS complex_ppm,
             |  CAST((84600 * SUM(y)) // SUM(w) AS BIGINT) AS flesch_syll_milli
             |FROM per GROUP BY source, lang
             |ORDER BY source, lang""".stripMargin),
    ),

    // Longest INTRA-document repeat: per doc, the max n-gram length that
    // occurs at least twice — the self-plagiarism/boilerplate depth
    // signal q47's repeated-share ratios can't see (a doc can have low
    // repeat SHARE but one long verbatim block). Every n-gram of every
    // length is fingerprinted in O(1) from two prefix sums: with
    // h < 2^40 and 1-based positions, fp(i..j) = (P2(j) − P2(i−1)) −
    // (i−1)·(P1(j) − P1(i−1)) = Σ (k−i+1)·h_k — position-weighted, so
    // order matters, and bounded < 2^54 (ANSI-safe; the oracle carries
    // the identical arithmetic, so fingerprint semantics are exactly
    // replicated). The (i−1, j) pair frame is len²/2 O(1)-wide rows per
    // doc — the whole scan is one doc-keyed self-join plus one partial
    // agg, no per-gram token slicing anywhere (the rule-10 HOF trap
    // never fires).
    QueryDef(
      "q258_max_repeat",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val pre = d
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
            pmod(Sampling.portableHash(col("tok")), lit(1099511627776L)).as("h"))
          .select(col("doc_id"), col("p"),
            sum(col("h")).over(w).as("p1"),
            sum(col("p") * col("h")).over(w).as("p2"))
        val rows = pre.unionByName(d.select(col("doc_id"), lit(0L).as("p"),
          lit(0L).as("p1"), lit(0L).as("p2")))
        val dups = rows.as("a").join(rows.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.p") > col("a.p"))
          .select(col("a.doc_id").as("doc_id"),
            (col("b.p") - col("a.p")).as("n"),
            ((col("b.p2") - col("a.p2")) -
              col("a.p") * (col("b.p1") - col("a.p1"))).as("fp"))
          .groupBy(col("doc_id"), col("n"), col("fp")).agg(count(lit(1)).as("c"))
          .where(col("c") >= 2)
          .groupBy(col("doc_id")).agg(max(col("n")).as("max_repeat"))
        d.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
          .join(dups, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("max_repeat"), lit(0L)).as("max_repeat"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, CAST(p AS BIGINT) AS p,
             |    CAST(('0x' || substring(md5(toks[p]),1,15)) AS BIGINT)
             |      % 1099511627776 AS h
             |  FROM (SELECT doc_id, toks,
             |          unnest(generate_series(1, len(toks))) AS p
             |        FROM (SELECT doc_id, string_split(text,' ') AS toks
             |              FROM documents))),
             |pre AS (
             |  SELECT doc_id, p,
             |    CAST(SUM(h) OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT) AS p1,
             |    CAST(SUM(p*h) OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT) AS p2
             |  FROM t),
             |rws AS (SELECT * FROM pre
             |        UNION ALL SELECT doc_id, 0, 0, 0 FROM documents),
             |g AS (
             |  SELECT a.doc_id, b.p - a.p AS n,
             |    (b.p2 - a.p2) - a.p*(b.p1 - a.p1) AS fp
             |  FROM rws a JOIN rws b ON a.doc_id = b.doc_id AND b.p > a.p),
             |dup AS (
             |  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS max_repeat FROM (
             |    SELECT doc_id, n, fp FROM g GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
             |  GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
             |  COALESCE(dup.max_repeat, 0) AS max_repeat
             |FROM documents d LEFT JOIN dup USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
    ),

    // SKIP-GRAM co-occurrence counts (window ±2) — the raw statistic
    // word2vec/GloVe-style embedding training consumes: directed
    // (center, context) pair counts within a 2-token window, top 30 by
    // count with a total tie order. One positional self-join per doc
    // (each token meets ≤4 partners — linear in corpus tokens), then a
    // partial-agg count; TakeOrderedAndProject ships the top-30 heads.
    QueryDef(
      "q274_skipgram_counts",
      (s, dir) => {
        val t = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
        t.toDF("doc_id", "pa", "ta")
          .join(t.toDF("doc_id", "pb", "tb"), "doc_id")
          .where(col("pb") =!= col("pa") &&
            abs(col("pb") - col("pa")) <= 2)
          .groupBy(col("ta").as("center"), col("tb").as("context"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("center"), col("context"))
          .limit(30)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, p, toks[p] AS tok
             |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS p
             |        FROM (SELECT doc_id, string_split(text,' ') AS toks
             |              FROM documents)))
             |SELECT a.tok AS center, b.tok AS context, COUNT(*)::BIGINT AS cnt
             |FROM t a JOIN t b ON a.doc_id = b.doc_id
             |  AND b.p <> a.p AND ABS(b.p - a.p) <= 2
             |GROUP BY 1, 2 ORDER BY cnt DESC, center, context LIMIT 30""".stripMargin),
    ),

    // NEGATIVE-SAMPLING table (unigram^0.75): per token, the word2vec
    // noise-distribution weight count^(3/4) = isqrt(isqrt(count³)) —
    // EXACT integer 4th root of the cube via two chained exact isqrt
    // corrections (the q126/q252 kernel, composed), so the smoothed
    // distribution is bit-identical cross-engine with zero libm. Shares
    // floor to ppm over the weight total. Overflow bound: count³ < 2^62
    // needs count < 1.6M — document the decimal(38) switch beyond.
    QueryDef(
      "q275_negative_sampling",
      (s, dir) => {
        import graft.ext.Sampling.isqrt
        val counts = tbl(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val w = counts.withColumn("w", isqrt(isqrt(col("c") * col("c") * col("c"))))
        w.crossJoin(broadcast(w.agg(sum(col("w")).as("w_sum"))))
          .select(col("tok"), col("c"), col("w"),
            expr("(w * 1000000) div w_sum").as("share_ppm"))
          .orderBy(col("tok"))
      },
      Some("""WITH c AS (
             |  SELECT tok, COUNT(*)::BIGINT AS c
             |  FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
             |  GROUP BY 1),
             |c3 AS (SELECT tok, c, c*c*c AS x,
             |         CAST(floor(sqrt(CAST(c*c*c AS DOUBLE))) AS BIGINT) AS s0
             |       FROM c),
             |r1 AS (
             |  SELECT tok, c,
             |    CASE WHEN (CASE WHEN s0*s0 > x THEN s0-1 ELSE s0 END + 1)
             |              * (CASE WHEN s0*s0 > x THEN s0-1 ELSE s0 END + 1) <= x
             |         THEN CASE WHEN s0*s0 > x THEN s0-1 ELSE s0 END + 1
             |         ELSE CASE WHEN s0*s0 > x THEN s0-1 ELSE s0 END END AS y
             |  FROM c3),
             |r2 AS (SELECT tok, c, y,
             |         CAST(floor(sqrt(CAST(y AS DOUBLE))) AS BIGINT) AS s0
             |       FROM r1),
             |w AS (
             |  SELECT tok, c,
             |    CASE WHEN (CASE WHEN s0*s0 > y THEN s0-1 ELSE s0 END + 1)
             |              * (CASE WHEN s0*s0 > y THEN s0-1 ELSE s0 END + 1) <= y
             |         THEN CASE WHEN s0*s0 > y THEN s0-1 ELSE s0 END + 1
             |         ELSE CASE WHEN s0*s0 > y THEN s0-1 ELSE s0 END END AS w
             |  FROM r2),
             |t AS (SELECT *, CAST(SUM(w) OVER () AS BIGINT) AS w_sum FROM w)
             |SELECT tok, c, w, (w * 1000000) // w_sum AS share_ppm
             |FROM t ORDER BY tok""".stripMargin),
    ),

    // SPAN-CORRUPTION plan (T5-style denoising prep): per doc, the
    // deterministic ~15% token mask (position masked iff the portable
    // hash of doc_id:position lands under 15/100) summarized as the
    // maximal-run SPAN schedule — span count, masked total, longest
    // span — via the islands trick (p − rank over masked positions is
    // constant within a run). The augmentation plan is a pure function
    // of ids, so every epoch/engine regenerates the identical schedule
    // (reproducible training), and the oracle replays it bit-for-bit.
    QueryDef(
      "q276_span_corruption_plan",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val pos = d.select(col("doc_id"), col("n_tokens"),
            explode(sequence(lit(1L), col("n_tokens"))).as("p"))
          .where(pmod(Sampling.portableHash(
            concat(col("doc_id"), lit(":"), col("p"))), lit(100)) < 15)
        val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        val spans = pos
          .withColumn("isl", col("p") - row_number().over(w))
          .groupBy(col("doc_id"), col("isl")).agg(count(lit(1)).as("len"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("n_masked"),
            max(col("len")).as("max_span_len"))
        d.select(col("doc_id"), col("n_tokens"))
          .join(spans, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_masked"), lit(0L)).as("n_masked"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("max_span_len"), lit(0L)).as("max_span_len"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, CAST(p AS BIGINT) AS p
             |  FROM (SELECT doc_id, unnest(generate_series(1, CAST(n_tokens AS INTEGER))) AS p
             |        FROM d)
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
             |          || CAST(p AS VARCHAR)),1,15)) AS BIGINT) % 100 < 15),
             |isl AS (
             |  SELECT doc_id,
             |    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS g
             |  FROM pos),
             |runs AS (
             |  SELECT doc_id, g, COUNT(*)::BIGINT AS len
             |  FROM isl GROUP BY 1, 2),
             |sp AS (
             |  SELECT doc_id, COUNT(*)::BIGINT AS n_spans,
             |    CAST(SUM(len) AS BIGINT) AS n_masked,
             |    CAST(MAX(len) AS BIGINT) AS max_span_len
             |  FROM runs GROUP BY 1)
             |SELECT d.doc_id, d.n_tokens,
             |  COALESCE(sp.n_masked, 0) AS n_masked,
             |  COALESCE(sp.n_spans, 0) AS n_spans,
             |  COALESCE(sp.max_span_len, 0) AS max_span_len
             |FROM d LEFT JOIN sp USING (doc_id) ORDER BY doc_id""".stripMargin),
    ),

    // CHI-SQUARE independence scan (lang × length tercile): the
    // categorical-association screen ("is document length independent of
    // language?") in EXACT integers — per cell, the scaled statistic
    // term (N·O − R·C)²·1e6 div (N·R·C); the 2-engine floor convention
    // makes even the chi-square terms hash-comparable. Length terciles
    // by NTILE with doc_id tiebreak (a global window over the doc
    // metadata frame — at scale swap in the q147 equi-depth bounds for
    // the bucketing; the statistic itself is rollup-sized).
    QueryDef(
      "q277_chi_square",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("len"))
          .withColumn("lt", ntile(3).over(
            Window.orderBy(col("len"), col("doc_id"))).cast("long"))
        val cells = d.groupBy(col("lang"), col("lt")).agg(count(lit(1)).as("o"))
        val r = d.groupBy(col("lang")).agg(count(lit(1)).as("r"))
        val c = d.groupBy(col("lt")).agg(count(lit(1)).as("cc"))
        val n = d.agg(count(lit(1)).as("n"))
        cells.join(r, "lang").join(c, "lt").crossJoin(broadcast(n))
          // the squared term × 1e6 passes 2^63 once N·O reaches ~3e6, so
          // the numerator rides decimal(38) (the Sketches q250 pattern —
          // DuckDB mirrors in HUGEINT); the quotient is back in BIGINT
          .select(col("lang"), col("lt"), col("o"), col("r"), col("cc"), col("n"),
            expr("cast((cast((n * o - r * cc) as decimal(38,0)) * (n * o - r * cc)" +
              " * 1000000) div (n * r * cc) as bigint)")
              .as("chi2_term_ppm"))
          .orderBy(col("lang"), col("lt"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS len
             |  FROM documents),
             |t AS (
             |  SELECT doc_id, lang,
             |    CAST(NTILE(3) OVER (ORDER BY len, doc_id) AS BIGINT) AS lt
             |  FROM d),
             |cells AS (SELECT lang, lt, COUNT(*)::BIGINT AS o FROM t GROUP BY 1, 2),
             |r AS (SELECT lang, COUNT(*)::BIGINT AS r FROM t GROUP BY 1),
             |c AS (SELECT lt, COUNT(*)::BIGINT AS cc FROM t GROUP BY 1),
             |n AS (SELECT COUNT(*)::BIGINT AS n FROM t)
             |SELECT cells.lang, cells.lt, o, r.r, c.cc, n.n,
             |  CAST(((n.n * o - r.r * c.cc)::HUGEINT * (n.n * o - r.r * c.cc)
             |        * 1000000) // (n.n * r.r * c.cc) AS BIGINT) AS chi2_term_ppm
             |FROM cells JOIN r USING (lang) JOIN c USING (lt) CROSS JOIN n
             |ORDER BY lang, lt""".stripMargin),
    ),

    // LEXICAL DIVERSITY per source — vocabulary richness as data:
    // token/type/hapax counts, type-token ratio and hapax share in
    // exact integer ppm (TextAnalysis.lexicalDiversity, decimal
    // rails). A template-y source reads LOW on both; natural scraped
    // text sits high — the curation signal next to q299's token
    // entropy. The oracle replays the two rollups.
    QueryDef(
      "q347_lexical_diversity",
      (s, dir) => TextAnalysis.lexicalDiversity(
          tbl(s, dir, "documents"), "source", "text")
        .orderBy(col("grp")),
      Some("""WITH w AS (
             |  SELECT source AS grp, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tc AS (SELECT grp, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
             |g AS (
             |  SELECT grp, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
             |  FROM tc GROUP BY grp)
             |SELECT grp, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  CAST(n_hapax AS BIGINT) AS n_hapax,
             |  CAST((CAST(n_types AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
             |    AS ttr_ppm,
             |  CAST((CAST(n_hapax AS HUGEINT) * 1000000) // n_types AS BIGINT)
             |    AS hapax_ppm
             |FROM g ORDER BY grp""".stripMargin),
    ),

    // Chao1 + Good-Turing vocabulary richness per source — the
    // crawl-planning readout: chao1 lower-bounds the vocabulary a
    // source would converge to, the Good-Turing mass f1/N is the
    // chance the next token is NEW. A near-exhausted source (low
    // unseen mass, chao1 ≈ observed) is done; keep crawling the other
    // kind. Bias-corrected chao1 so f2 = 0 never divides by zero;
    // exact truncating integer arithmetic throughout.
    QueryDef(
      "q361_vocab_richness",
      (s, dir) => TextAnalysis.vocabularyRichness(
          tbl(s, dir, "documents"), "source", "text")
        .orderBy(col("grp")),
      Some("""WITH w AS (
             |  SELECT source AS grp, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tc AS (SELECT grp, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
             |g AS (
             |  SELECT grp, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             |    SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
             |  FROM tc GROUP BY grp)
             |SELECT grp, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             |  CAST(n_types + (CAST(f1 AS HUGEINT) * (f1 - 1)) // (2 * (f2 + 1))
             |       AS BIGINT) AS chao1,
             |  CAST((CAST(f1 AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
             |    AS gt_unseen_ppm
             |FROM g ORDER BY grp""".stripMargin),
    ),

    // INCREMENTAL vocabulary richness — the corpus-accounting analog of
    // the graph family's maintained forms: the (source, token, count)
    // frame is maintained by a document DELTA (only the delta is
    // tokenized; the archive is never re-read) and the Chao1/
    // Good-Turing readout runs over the maintained frame. Proof
    // obligation: the oracle is the ONE-SHOT richness over ALL
    // documents, so a pass proves maintained ≡ recompute.
    QueryDef(
      "q365_incremental_vocab",
      (s, dir) => {
        val docs = PinnedCache.pin(tbl(s, dir, "documents"))
        val base = docs.where(col("doc_id") % 3 =!= 0)
        val delta = docs.where(col("doc_id") % 3 === 0)
        TextAnalysis.richnessFromCounts(
            TextAnalysis.incrementalTokenCounts(
              TextAnalysis.tokenCounts(base, "source", "text"),
              delta, "source", "text"))
          .orderBy(col("grp"))
      },
      Some("""WITH w AS (
             |  SELECT source AS grp, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tc AS (SELECT grp, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
             |g AS (
             |  SELECT grp, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             |    SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
             |  FROM tc GROUP BY grp)
             |SELECT grp, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
             |  CAST(n_types + (CAST(f1 AS HUGEINT) * (f1 - 1)) // (2 * (f2 + 1))
             |       AS BIGINT) AS chao1,
             |  CAST((CAST(f1 AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
             |    AS gt_unseen_ppm
             |FROM g ORDER BY grp""".stripMargin),
    ),
  )
}
