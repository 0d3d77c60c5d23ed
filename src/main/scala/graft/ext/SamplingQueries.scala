package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Sampling / splits / packing / layout / privacy family (CATALOG.md 'Sampling, splits, packing, layout').
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object SamplingQueries {

  def queries: Seq[QueryDef] = Seq(

    // Deterministic train/val/test split audit: membership is a pure
    // function of a portable content hash — reproducible across engines,
    // runs and repartitionings (what a dataset release needs).
    QueryDef(
      "q45_split_stats",
      (s, dir) => Sampling.splitStats(tbl(s, dir, "documents"), "doc_id", 80, 10)
        .orderBy(col("source"), col("split")),
      Some("""SELECT source, split, COUNT(*) AS docs,
             |  CAST(SUM(t) AS BIGINT) AS tokens, MIN(doc_id) AS first_doc
             |FROM (SELECT source, doc_id, len(string_split(text,' ')) AS t,
             |        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |             ELSE 'test' END AS split
             |      FROM (SELECT *,
             |              CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
             |            FROM documents))
             |GROUP BY source, split ORDER BY source, split""".stripMargin),
    ),


    // Sequence chunking: docs split into 16-token training chunks, content
    // fingerprinted. Pure map work (HOF explode, no shuffle).
    QueryDef(
      "q50_chunking",
      (s, dir) => Packing.chunkTokens(tbl(s, dir, "documents"), "text", "doc_id", 16)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |e AS (SELECT doc_id, t,
             |        unnest(generate_series(1, (len(t)+15)//16)) AS i
             |      FROM d WHERE len(t) > 0)
             |SELECT doc_id, i-1 AS chunk_id,
             |  LEAST(len(t) - (i-1)*16, 16) AS chunk_tokens,
             |  md5(array_to_string(t[(i-1)*16+1 : LEAST(len(t), i*16)], ' ')) AS chunk_md5
             |FROM e ORDER BY doc_id, chunk_id""".stripMargin),
    ),


    // Greedy in-order sequence packing: chunks fill 64-token bins per
    // source; bin = floor(running tokens before / budget) — deterministic,
    // one (source,int)-keyed shuffle.
    QueryDef(
      "q51_packing",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val chunks = Packing.chunkTokens(docs, "text", "doc_id", 16)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        Packing.packBins(chunks, col("source"), 64)
          .orderBy(col("grp"), col("bin_id"))
      },
      Some("""WITH d AS (SELECT doc_id, source, string_split(text,' ') AS t FROM documents),
             |e AS (SELECT doc_id, source, t,
             |        unnest(generate_series(1, (len(t)+15)//16)) AS i
             |      FROM d WHERE len(t) > 0),
             |c AS (
             |  SELECT source, doc_id, i-1 AS chunk_id,
             |    LEAST(len(t) - (i-1)*16, 16) AS chunk_tokens
             |  FROM e),
             |r AS (SELECT source, chunk_tokens,
             |        SUM(chunk_tokens) OVER (PARTITION BY source
             |          ORDER BY doc_id, chunk_id) AS cum FROM c)
             |SELECT source AS grp, CAST((cum - chunk_tokens) // 64 AS BIGINT) AS bin_id,
             |  COUNT(*) AS n_chunks, CAST(SUM(chunk_tokens) AS BIGINT) AS bin_tokens
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),


    // Corpus mixture: stratified downsampling (src0 keeps 40%, src1 60%)
    // composed with integer upsampling weights (src2 x3, src3 x2) — the
    // deterministic data-mixing op. All counts integer; membership is the
    // portable hash, replicated exactly oracle-side.
    QueryDef(
      "q56_mixture",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val sampled = Sampling.stratifiedSample(docs, "doc_id", "source",
          Map("src0" -> 40, "src1" -> 60))
        Sampling.upsample(sampled, "source", Map("src2" -> 3, "src3" -> 2))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("rows_out"),
            countDistinct(col("doc_id")).as("docs_kept"),
            sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("tokens_out"))
          .orderBy(col("source"))
      },
      Some("""WITH kept AS (
             |  SELECT * FROM documents
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100
             |        < CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 60 ELSE 100 END),
             |up AS (
             |  SELECT *, unnest(generate_series(1,
             |    CASE source WHEN 'src2' THEN 3 WHEN 'src3' THEN 2 ELSE 1 END)) AS copy
             |  FROM kept)
             |SELECT source, COUNT(*) AS rows_out,
             |  COUNT(DISTINCT doc_id) AS docs_kept,
             |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens_out
             |FROM up GROUP BY source ORDER BY source""".stripMargin),
    ),


    // PII redaction audit: mask numeric identifiers in a free-text field,
    // count hits, pseudonymize the key via the portable content hash.
    // Pure map work inside WholeStageCodegen — a 100 TB sweep is one scan.
    QueryDef(
      "q62_pii_redact",
      (s, dir) => Privacy.redactionAudit(tbl(s, dir, "customer"),
          "c_custkey", "c_name", Privacy.NumericIdPattern, "[ID]")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)),1,15)) AS BIGINT)
             |    AS pseudo_id,
             |  regexp_replace(c_name, '[0-9]{3,}', '[ID]', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(c_name, '[0-9]{3,}')) AS BIGINT) AS n_hits
             |FROM customer ORDER BY c_custkey""".stripMargin),
    ),


    // Deterministic k-per-group sample: "random" by hash uniformity, yet a
    // pure function of the ids — the reproducible alternative to reservoir
    // sampling whose output survives re-partitioning and re-processing.
    QueryDef(
      "q64_group_sample",
      (s, dir) => Sampling.groupSample(tbl(s, dir, "documents"), "lang", "doc_id", 20)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy(col("lang"), col("rk")),
      Some("""WITH r AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY
             |      CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT),
             |      doc_id) AS rk
             |  FROM documents)
             |SELECT lang, doc_id, rk FROM r WHERE rk <= 20
             |ORDER BY lang, rk""".stripMargin),
    ),


    // Split-balance audit: does each hash split preserve the corpus's
    // language mix? Emits per-(split, lang) doc counts plus both shares
    // scaled to exact integer rationals (ppm) — no float division until
    // the final fixed denominator, so both engines agree bit-for-bit.
    QueryDef(
      "q74_split_balance",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("split", Sampling.splitColumn(col("doc_id"), 80, 10))
        // total derived lazily as a global window over the lang rollup
        // (lang-cardinality rows) — no eager driver action at build time
        val corpus = docs.groupBy(col("lang")).agg(count(lit(1)).as("corpus_docs"))
          .withColumn("total",
            sum(col("corpus_docs")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
        docs.groupBy(col("split"), col("lang")).agg(count(lit(1)).as("docs"))
          .withColumn("split_total",
            sum(col("docs")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("split"))))
          .join(corpus, "lang")
          .select(col("split"), col("lang"), col("docs"),
            expr("docs * 1000000 div split_total").as("share_ppm"),
            // integer div in BOTH engines: double-div + cast would round in
            // DuckDB but truncate in Spark
            expr("(corpus_docs * 1000000) div total").as("corpus_ppm"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""WITH d AS (
             |  SELECT lang,
             |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM (SELECT lang,
             |          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
             |        FROM documents)),
             |c AS (SELECT lang, COUNT(*) AS corpus_docs FROM documents GROUP BY lang),
             |t AS (SELECT COUNT(*) AS total FROM documents),
             |g AS (SELECT split, lang, COUNT(*) AS docs FROM d GROUP BY split, lang),
             |st AS (SELECT split, SUM(docs) AS split_total FROM g GROUP BY split)
             |SELECT g.split, g.lang, g.docs,
             |  CAST(g.docs * 1000000 // st.split_total AS BIGINT) AS share_ppm,
             |  c.corpus_docs * 1000000 // t.total AS corpus_ppm
             |FROM g JOIN st USING (split) JOIN c USING (lang), t
             |ORDER BY g.split, g.lang""".stripMargin),
    ),


    // Token-budget mixture planner: per-source sampling rates + expected
    // yield for a 20k-token budget under a skewed target mixture (5 heavy
    // sources at 12% each, 15 light at ~2.7%), with oversubscription
    // flags. One weight map drives BOTH engines (interpolated as VALUES).
    {
      val mixWeights: Seq[(String, Long)] =
        (0 until 20).map(i => s"src$i" -> (if (i < 5) 120000L else 26666L))
      val budget = 20000L
      val valuesSql = mixWeights
        .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      QueryDef(
        "q115_mixture_plan",
        (s, dir) => Sampling.mixturePlan(
            tbl(s, dir, "documents"), "text", "source", budget, mixWeights.toMap)
          .orderBy(col("source")),
        Some(s"""WITH w(source, weight_ppm) AS (SELECT * FROM (VALUES $valuesSql)),
                |t AS (
                |  SELECT source, COUNT(*) AS docs,
                |    CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens
                |  FROM documents GROUP BY source)
                |SELECT t.source, t.docs, t.tokens,
                |  CAST(COALESCE(w.weight_ppm, 0) AS BIGINT) AS weight_ppm,
                |  (CAST($budget AS BIGINT) * COALESCE(w.weight_ppm, 0)) // 1000000 AS target_tokens,
                |  LEAST(1000000,
                |    (((CAST($budget AS BIGINT) * COALESCE(w.weight_ppm, 0)) // 1000000) * 1000000)
                |      // t.tokens) AS rate_ppm,
                |  (t.tokens * LEAST(1000000,
                |    (((CAST($budget AS BIGINT) * COALESCE(w.weight_ppm, 0)) // 1000000) * 1000000)
                |      // t.tokens)) // 1000000 AS expected_tokens,
                |  (CAST($budget AS BIGINT) * COALESCE(w.weight_ppm, 0)) // 1000000 > t.tokens
                |    AS oversubscribed
                |FROM t LEFT JOIN w USING (source) ORDER BY t.source""".stripMargin),
      )
    },


    // The mixture planner on EXACT tokens: q115's integer ppm math fed by
    // q117's greedy wordpiece counts instead of the whitespace estimate —
    // budgets stop being estimates. The oracle composes the recursive
    // greedy-loop CTE with the planner arithmetic end-to-end.
    {
      val mixWeights: Seq[(String, Long)] =
        (0 until 20).map(i => s"src$i" -> (if (i < 5) 120000L else 26666L))
      val budget = 60000L
      val valuesSql = mixWeights
        .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      QueryDef(
        "q118_mixture_exact_tokens",
        (s, dir) => Sampling.mixturePlanFromCounts(
            tbl(s, dir, "documents").select(col("doc_id"), col("source"))
              .join(Tokenize.wordpieceCounts(s, tbl(s, dir, "documents"),
                  "text", "doc_id")
                .toDF().select(col("doc_id"), col("n_subwords").as("n_tok")),
                "doc_id"),
            budget, mixWeights.toMap)
          .orderBy(col("source")),
        Some(s"""WITH RECURSIVE w AS (
                |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
                |steps AS (
                |  SELECT doc_id, w, 1 AS pos, 0 AS n FROM w
                |  UNION ALL
                |  SELECT doc_id, w,
                |    pos + CASE
                |${Tokenize.greedyCaseWhens(Tokenize.DefaultMerges)}
                |      ELSE 1 END,
                |    n + 1
                |  FROM steps WHERE pos <= len(w)),
                |cnt AS (
                |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tok
                |  FROM steps WHERE pos > len(w) GROUP BY doc_id),
                |wt(source, weight_ppm) AS (SELECT * FROM (VALUES $valuesSql)),
                |t AS (
                |  SELECT d.source, COUNT(*) AS docs,
                |    CAST(SUM(c.n_tok) AS BIGINT) AS tokens
                |  FROM documents d JOIN cnt c USING (doc_id) GROUP BY d.source)
                |SELECT t.source, t.docs, t.tokens,
                |  CAST(COALESCE(wt.weight_ppm, 0) AS BIGINT) AS weight_ppm,
                |  (CAST($budget AS BIGINT) * COALESCE(wt.weight_ppm, 0)) // 1000000 AS target_tokens,
                |  LEAST(1000000,
                |    (((CAST($budget AS BIGINT) * COALESCE(wt.weight_ppm, 0)) // 1000000) * 1000000)
                |      // t.tokens) AS rate_ppm,
                |  (t.tokens * LEAST(1000000,
                |    (((CAST($budget AS BIGINT) * COALESCE(wt.weight_ppm, 0)) // 1000000) * 1000000)
                |      // t.tokens)) // 1000000 AS expected_tokens,
                |  (CAST($budget AS BIGINT) * COALESCE(wt.weight_ppm, 0)) // 1000000 > t.tokens
                |    AS oversubscribed
                |FROM t LEFT JOIN wt USING (source) ORDER BY t.source""".stripMargin),
      )
    },


    // Temperature-scaled (alpha = 1/2) mixture plan: weights derived from
    // the data as sqrt(source tokens) instead of a hand-picked map — the
    // multilingual-pretraining smoothing rule, composed with q115's ppm
    // planner arithmetic. The exact integer sqrt (double seed + two
    // integer corrections) keeps every ppm bit-exact across engines no
    // matter how either rounds sqrt().
    {
      val budget = 26000L // between 20*min and 20*max source tokens, so both flags occur
      QueryDef(
        "q126_alpha_mixture_plan",
        (s, dir) => Sampling.alphaMixturePlan(
            tbl(s, dir, "documents"), "text", "source", budget)
          .orderBy(col("source")),
        Some(s"""WITH c AS (
                |  SELECT source, COUNT(*) AS docs,
                |    CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens
                |  FROM documents GROUP BY source),
                |s0 AS (SELECT c.*, CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS a FROM c),
                |s1 AS (SELECT s0.*, CASE WHEN a*a > tokens THEN a-1 ELSE a END AS b FROM s0),
                |ws AS (SELECT source, docs, tokens,
                |         CASE WHEN (b+1)*(b+1) <= tokens THEN b+1 ELSE b END AS w_sqrt FROM s1),
                |t AS (SELECT ws.*, CAST(SUM(w_sqrt) OVER () AS BIGINT) AS sum_sqrt FROM ws),
                |w AS (SELECT source, docs, tokens, w_sqrt,
                |        (w_sqrt * 1000000) // sum_sqrt AS weight_ppm FROM t),
                |g AS (SELECT w.*, (CAST($budget AS BIGINT) * weight_ppm) // 1000000 AS target_tokens FROM w),
                |r AS (SELECT g.*, LEAST(1000000, (target_tokens * 1000000) // tokens) AS rate_ppm FROM g)
                |SELECT source, docs, tokens, w_sqrt, weight_ppm, target_tokens, rate_ppm,
                |  (tokens * rate_ppm) // 1000000 AS expected_tokens,
                |  target_tokens > tokens AS oversubscribed
                |FROM r ORDER BY source""".stripMargin),
      )
    },


    // Deterministic epoch shard plan: (shard, pos, token offset) per doc
    // as a pure function of (doc_id, seed) — the map-only replacement for
    // a global training shuffle; next epoch = next seed, no data movement.
    // Everything keys off the portable md5 hash, so the oracle recomputes
    // the identical assignment.
    QueryDef(
      "q142_shard_plan",
      (s, dir) => Sampling.shardPlan(tbl(s, dir, "documents"),
          "doc_id", "text", numShards = 8, seed = 7)
        .orderBy(col("shard"), col("pos")),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':7'),1,15))
             |         AS BIGINT) AS hv,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT doc_id, hv % 8 AS shard,
             |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos, n_tokens,
             |  CAST(SUM(n_tokens) OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id
             |                           ROWS UNBOUNDED PRECEDING) - n_tokens
             |       AS BIGINT) AS tok_offset
             |FROM h
             |WINDOW w AS (PARTITION BY hv % 8 ORDER BY hv, doc_id)
             |ORDER BY shard, pos""".stripMargin),
    ),


    // Curriculum-ordered shard plan: 4 equal-count quality phases (exact
    // equi-depth cuts over the ppm-quantized q32 score) x 4 hash shards,
    // deterministic within-cell order — quality-staged training order as
    // a pure function of (doc, seed). Oracle replays score, cuts, hash,
    // and positions.
    QueryDef(
      "q161_curriculum_order",
      (s, dir) => Sampling.curriculumShardPlan(tbl(s, dir, "documents"),
          "text", "doc_id", phases = 4, shards = 4, seed = 3)
        .orderBy(col("phase"), col("shard"), col("pos")),
      Some(s"""WITH sc AS (
              |  SELECT doc_id, CAST(floor(ROUND(
              |    LEAST(t / 50.0, 1.0) * 0.4 +
              |    (CAST(len(list_filter(tokens, w -> w IN
              |       (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |    CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8 THEN 0.3 ELSE 0.0 END,
              |    6) * 1000000) AS BIGINT) AS q
              |  FROM (SELECT doc_id, string_split(text,' ') AS tokens,
              |               len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |        FROM documents)),
              |c AS (SELECT q AS v, COUNT(*) AS cnt FROM sc GROUP BY q),
              |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
              |b AS (
              |  SELECT v, cnt, COALESCE(SUM(cnt) OVER (ORDER BY v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
              |  FROM c),
              |bounds AS (
              |  SELECT CAST((cb * 4) // t.n + 1 AS BIGINT) AS phase,
              |    MIN(v) AS lo, MAX(v) AS hi
              |  FROM b, t GROUP BY 1),
              |h AS (
              |  SELECT sc.doc_id, sc.q, bo.phase,
              |    CAST(('0x' || substring(md5(CAST(sc.doc_id AS VARCHAR) || ':3'),1,15))
              |         AS BIGINT) AS hv
              |  FROM sc JOIN bounds bo ON sc.q >= bo.lo AND sc.q <= bo.hi)
              |SELECT doc_id, q, phase, hv % 4 AS shard,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY phase, hv % 4
              |                          ORDER BY hv, doc_id) AS BIGINT) AS pos
              |FROM h ORDER BY phase, shard, pos""".stripMargin),
    ),


    // Split-distribution identity audit: grid-KS distance of each hash
    // split's token-count distribution vs the rest — the release gate
    // that train/val/test are DISTRIBUTIONALLY identical, not just
    // share-balanced (q74 checks shares; this checks shapes). Composes
    // the portable split assignment with the q110 integer KS machinery.
    QueryDef(
      "q163_split_drift",
      (s, dir) => Histogram.ksDrift(
          tbl(s, dir, "documents")
            .select(Sampling.splitColumn(col("doc_id"), 80, 10).as("split"),
              TextAnalysis.tokenCount(col("text")).cast("double").as("v")),
          col("split"), col("v"), 1)
        .withColumnRenamed("grp", "split")
        .orderBy(col("split")),
      Some("""WITH d AS (
             |  SELECT CASE
             |    WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |         AS BIGINT) % 100 < 80 THEN 'train'
             |    WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |         AS BIGINT) % 100 < 90 THEN 'val'
             |    ELSE 'test' END AS grp,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS bin
             |  FROM documents),
             |b AS (SELECT grp, bin, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
             |dense AS (
             |  SELECT g.grp, a.bin, COALESCE(b.cnt, 0) AS cnt
             |  FROM (SELECT DISTINCT grp FROM b) g
             |  CROSS JOIN (SELECT DISTINCT bin FROM b) a
             |  LEFT JOIN b ON b.grp = g.grp AND b.bin = a.bin),
             |c AS (
             |  SELECT grp, bin, cnt,
             |    SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
             |    SUM(cnt) OVER (PARTITION BY grp) AS n_g,
             |    SUM(cnt) OVER () AS n_all
             |  FROM dense),
             |c2 AS (SELECT *, SUM(cum) OVER (PARTITION BY bin) AS gcum FROM c)
             |SELECT grp AS split, CAST(MAX(n_g) AS BIGINT) AS n,
             |  CAST(MAX(abs(cum*(n_all-n_g) - (gcum-cum)*n_g)) AS BIGINT) AS ks_scaled,
             |  CAST(MAX(abs(cum*(n_all-n_g) - (gcum-cum)*n_g)) AS DOUBLE)
             |    / (MAX(n_g) * (MAX(n_all) - MAX(n_g))) AS ks
             |FROM c2 GROUP BY grp ORDER BY split""".stripMargin),
    ),


    // Train->test SPLIT contamination audit: which test-split docs share a
    // 3-gram with the train split — eval hygiene of the release's OWN
    // split (q48/q125 audit against an EXTERNAL eval set). Composes the
    // portable hash split with the broadcast gram probe.
    QueryDef(
      "q168_split_contamination",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("split", Sampling.splitColumn(col("doc_id"), 80, 10))
        Dedup.contaminatedDocs(
            d.where(col("split") === "test"),
            d.where(col("split") === "train"), "text", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, text,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |              AS BIGINT) % 100 < 80 THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |              AS BIGINT) % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, split,
             |    list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
             |                   FOR i IN generate_series(1, len(t)-2)]) AS gs
             |  FROM (SELECT doc_id, split, string_split(text,' ') AS t FROM sp)),
             |b AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE split = 'train'),
             |t AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE split = 'test')
             |SELECT doc_id, COUNT(*) AS matched_ngrams
             |FROM t JOIN b USING (gram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),


    // Padding-waste audit: arrival-order vs length-sorted batches at
    // B = 8 — how much trainer compute pad tokens burn, and how much
    // sorted batching recovers. Integer ppm; tail batch pads to its own
    // size.
    QueryDef(
      "q178_padding_waste",
      (s, dir) => Packing.paddingWaste(tbl(s, dir, "documents"),
          "text", "doc_id", batchSize = 8)
        .orderBy(col("strategy")),
      Some("""WITH base AS (
             |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS len
             |  FROM documents),
             |a AS (
             |  SELECT len, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 8 AS batch
             |  FROM base),
             |ab AS (SELECT batch, COUNT(*) AS bn, MAX(len) AS mx,
             |         CAST(SUM(len) AS BIGINT) AS sm FROM a GROUP BY batch),
             |ar AS (SELECT 'arrival' AS strategy, COUNT(*) AS n_batches,
             |         CAST(SUM(sm) AS BIGINT) AS tokens,
             |         CAST(SUM(bn * mx) AS BIGINT) AS padded_slots FROM ab),
             |s AS (
             |  SELECT len, (ROW_NUMBER() OVER (ORDER BY len, doc_id) - 1) // 8 AS batch
             |  FROM base),
             |sb AS (SELECT batch, COUNT(*) AS bn, MAX(len) AS mx,
             |         CAST(SUM(len) AS BIGINT) AS sm FROM s GROUP BY batch),
             |sr AS (SELECT 'sorted' AS strategy, COUNT(*) AS n_batches,
             |         CAST(SUM(sm) AS BIGINT) AS tokens,
             |         CAST(SUM(bn * mx) AS BIGINT) AS padded_slots FROM sb)
             |SELECT strategy, n_batches, tokens, padded_slots,
             |  ((padded_slots - tokens) * 1000000) // padded_slots AS waste_ppm
             |FROM (SELECT * FROM ar UNION ALL SELECT * FROM sr)
             |ORDER BY strategy""".stripMargin),
    ),


    // Neyman optimal stratified allocation: per-source sample counts
    // proportional to N_h*sigma_h = isqrt(N_h*sum(x^2) - sum(x)^2) —
    // exact integers end to end (the variance-minimizing design at fixed
    // budget); ppm shares, floor allocations capped at N_h.
    QueryDef(
      "q179_neyman_allocation",
      (s, dir) => Sampling.neymanAllocation(tbl(s, dir, "documents"),
          "text", "source", sampleBudget = 200L)
        .orderBy(col("source")),
      Some("""WITH b AS (
             |  SELECT source, CAST(len(string_split(text,' ')) AS BIGINT) AS x
             |  FROM documents),
             |st AS (
             |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(x*x) AS BIGINT) AS sxx
             |  FROM b GROUP BY source),
             |s0 AS (SELECT st.*, n_docs*sxx - sx*sx AS rad,
             |         CAST(floor(sqrt(CAST(n_docs*sxx - sx*sx AS DOUBLE))) AS BIGINT) AS a
             |       FROM st),
             |s1 AS (SELECT s0.*, CASE WHEN a*a > rad THEN a-1 ELSE a END AS b2 FROM s0),
             |ws AS (SELECT source, n_docs,
             |         CASE WHEN (b2+1)*(b2+1) <= rad THEN b2+1 ELSE b2 END AS w
             |       FROM s1),
             |t AS (SELECT ws.*, CAST(SUM(w) OVER () AS BIGINT) AS sum_w FROM ws)
             |SELECT source, n_docs, w, (w * 1000000) // sum_w AS weight_ppm,
             |  LEAST((200 * w) // sum_w, n_docs) AS alloc
             |FROM t ORDER BY source""".stripMargin),
    ),


    // Closed-loop split repair: q168's contamination audit as an ACTION —
    // contaminated test docs move to train (one round), reported as the
    // (orig, final) migration rollup. Broadcast gram probe + doc-keyed
    // left join + bounded rollup.
    QueryDef(
      "q180_split_repair",
      (s, dir) => Sampling.repairSplitContamination(tbl(s, dir, "documents"),
          "text", "doc_id", 80, 10)
        .orderBy(col("split_orig"), col("split_final")),
      Some("""WITH sp AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |              AS BIGINT) % 100 < 80 THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |              AS BIGINT) % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split_orig
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, split_orig,
             |    list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
             |                   FOR i IN generate_series(1, len(t)-2)]) AS gs
             |  FROM (SELECT doc_id, split_orig, string_split(text,' ') AS t FROM sp)),
             |b AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE split_orig = 'train'),
             |mv AS (
             |  SELECT DISTINCT t.doc_id
             |  FROM (SELECT doc_id, unnest(gs) AS gram FROM g WHERE split_orig = 'test') t
             |  JOIN b USING (gram))
             |SELECT sp.split_orig,
             |  CASE WHEN mv.doc_id IS NOT NULL THEN 'train' ELSE sp.split_orig END AS split_final,
             |  COUNT(*) AS n_docs, CAST(SUM(sp.n_tok) AS BIGINT) AS tokens
             |FROM sp LEFT JOIN mv ON mv.doc_id = sp.doc_id
             |GROUP BY 1, 2 ORDER BY split_orig, split_final""".stripMargin),
    ),


    // k-anonymity audit over the quasi-identifier pair (nation, market
    // segment): equivalence classes smaller than k = 8 are
    // re-identification risks — report each risky class and the overall
    // share of exposed customers. The release-gate check that runs
    // BEFORE q62's value-level redaction (suppressing PII inside a row
    // doesn't help if the row's attribute combination is unique).
    QueryDef(
      "q224_k_anonymity",
      (s, dir) => {
        val cells = PinnedCache.pin(tbl(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("long").as("nationkey"),
            col("c_mktsegment").as("mktsegment"))
          .agg(count(lit(1)).as("class_size")))
        val tot = cells.agg(sum(col("class_size")).as("n_customers"),
          sum(when(col("class_size") < 8, col("class_size")).otherwise(0L))
            .as("n_exposed"))
        cells.where(col("class_size") < 8)
          .crossJoin(broadcast(tot))
          .select(col("nationkey"), col("mktsegment"), col("class_size"),
            col("n_customers"),
            expr("(n_exposed * 1000000) div n_customers").as("exposed_ppm"))
          .orderBy(col("nationkey"), col("mktsegment"))
      },
      Some("""WITH cells AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS mktsegment,
             |    COUNT(*) AS class_size
             |  FROM customer GROUP BY 1, 2),
             |t AS (
             |  SELECT CAST(SUM(class_size) AS BIGINT) AS n_customers,
             |    CAST(SUM(CASE WHEN class_size < 8 THEN class_size ELSE 0 END) AS BIGINT)
             |      AS n_exposed
             |  FROM cells)
             |SELECT nationkey, mktsegment, class_size, t.n_customers,
             |  CAST((t.n_exposed * 1000000) // t.n_customers AS BIGINT) AS exposed_ppm
             |FROM cells CROSS JOIN t
             |WHERE class_size < 8
             |ORDER BY nationkey, mktsegment""".stripMargin),
    ),


    // Neyman-optimal audit-sampling plan: split a 1000-doc quality-audit
    // budget across sources proportionally to N_h·sigma_h of document
    // length — exact integer sigma via isqrt(N·Σy² − (Σy)²), floors
    // topped up to EXACTLY the budget by the largest-remainder rule.
    // The n_alloc <= N_h cap fires at sf0.001 (500 docs < 2x budget) and
    // not at sf0.01 — both branches gate-exercised.
    QueryDef(
      "q252_neyman_allocation",
      (s, dir) => Sampling.neymanAllocation(tbl(s, dir, "documents"),
          "source", size(split(col("text"), " ")), budget = 1000L)
        .orderBy(col("source")),
      Some("""WITH b AS (
             |  SELECT source AS g, CAST(len(string_split(text, ' ')) AS BIGINT) AS y
             |  FROM documents),
             |a AS (
             |  SELECT g, COUNT(*)::BIGINT AS n_rows,
             |    CAST(SUM(y) AS BIGINT) AS s1, CAST(SUM(y*y) AS BIGINT) AS s2
             |  FROM b GROUP BY 1),
             |v AS (SELECT g, n_rows, n_rows * s2 - s1 * s1 AS vv FROM a),
             |r AS (
             |  SELECT g, n_rows,
             |    CASE WHEN (CASE WHEN s0*s0 > vv THEN s0-1 ELSE s0 END + 1)
             |              * (CASE WHEN s0*s0 > vv THEN s0-1 ELSE s0 END + 1) <= vv
             |         THEN CASE WHEN s0*s0 > vv THEN s0-1 ELSE s0 END + 1
             |         ELSE CASE WHEN s0*s0 > vv THEN s0-1 ELSE s0 END END AS w
             |  FROM (SELECT g, n_rows, vv,
             |          CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS BIGINT) AS s0 FROM v)),
             |al AS (
             |  SELECT g, n_rows, w,
             |    CAST(SUM(w) OVER () AS BIGINT) AS w_sum,
             |    (1000 * w) // CAST(SUM(w) OVER () AS BIGINT) AS n_floor,
             |    (1000 * w) % CAST(SUM(w) OVER () AS BIGINT) AS rem
             |  FROM r),
             |fin AS (
             |  SELECT g, n_rows, w, n_floor,
             |    CAST(SUM(n_floor) OVER () AS BIGINT) AS floor_sum,
             |    CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, g) AS BIGINT) AS rem_rank
             |  FROM al)
             |SELECT g AS source, n_rows, w AS n_sigma,
             |  LEAST(n_floor + CASE WHEN rem_rank <= 1000 - floor_sum THEN 1 ELSE 0 END,
             |        n_rows) AS n_alloc,
             |  (n_floor + CASE WHEN rem_rank <= 1000 - floor_sum THEN 1 ELSE 0 END)
             |    > n_rows AS capped
             |FROM fin ORDER BY source""".stripMargin),
    ),

    // Z-ORDER layout audit: interleave the low 16 bits of (user, day)
    // into a Morton z-value, cut the curve into 4096-cell ranges (the
    // file/row-group analog), and measure per-range extents of BOTH
    // dimensions — the locality statistic that predicts min/max-stats
    // pruning effectiveness for two-column predicates (the lakehouse
    // OPTIMIZE ZORDER decision input; a linear sort keys one dimension
    // perfectly and leaves the other unbounded). Pure integer bit
    // arithmetic, 32 literal terms interpolated identically into the
    // oracle; the audit itself is one partial-agg rollup over occupied
    // ranges.
    QueryDef(
      "q259_zorder_audit",
      (s, dir) => {
        def bits(c: org.apache.spark.sql.Column, off: Int) =
          (0 until 16).map(k => shiftleft(shiftright(c, k).bitwiseAND(lit(1L)),
            2 * k + off): org.apache.spark.sql.Column).reduce(_ + _)
        val ev = tbl(s, dir, "events").select(
          pmod(col("user_id"), lit(65536L)).as("u"),
          pmod(expr("ts div 86400000000000"), lit(65536L)).as("d"))
        ev.withColumn("z", bits(col("u"), 0) + bits(col("d"), 1))
          .groupBy(expr("z div 4096").as("bucket"))
          .agg(count(lit(1)).as("c"),
            (max(col("u")) - min(col("u")) + 1).as("ue"),
            (max(col("d")) - min(col("d")) + 1).as("de"))
          .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_buckets"),
            max(col("c")).as("max_bucket_rows"),
            sum(col("ue")).as("sum_u_extent"), sum(col("de")).as("sum_d_extent"))
      },
      Some({
        def bitsSql(c: String, off: Int): String = (0 until 16).map(k =>
          s"((($c >> $k) & 1) << ${2 * k + off})").mkString(" + ")
        s"""WITH e AS (
           |  SELECT user_id % 65536 AS u,
           |    (epoch_ns(ts) // 86400000000000) % 65536 AS d
           |  FROM events),
           |z AS (SELECT u, d, ${bitsSql("u", 0)} + ${bitsSql("d", 1)} AS z FROM e),
           |per AS (
           |  SELECT z // 4096 AS bucket, COUNT(*)::BIGINT AS c,
           |    MAX(u) - MIN(u) + 1 AS ue, MAX(d) - MIN(d) + 1 AS de
           |  FROM z GROUP BY 1)
           |SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           |  COUNT(*)::BIGINT AS n_buckets,
           |  CAST(MAX(c) AS BIGINT) AS max_bucket_rows,
           |  CAST(SUM(ue) AS BIGINT) AS sum_u_extent,
           |  CAST(SUM(de) AS BIGINT) AS sum_d_extent
           |FROM per""".stripMargin
      }),
    ),

    // CONSISTENT-HASHING shard map audit: 4 shards × 16 virtual nodes on
    // a 60-bit ring (vnode position = portable hash of 'vn:'||v, doc
    // position likewise; owner = the vnode at the smallest clockwise
    // distance, shard = v div 16). The audit measures balance AND the
    // scale-out contract: adding shard 4 (16 new vnodes, existing vnodes
    // untouched) must remap only the ring arcs the new vnodes capture —
    // ~1/5 of docs — where a mod-N scheme would remap ~4/5. Owner lookup
    // is a broadcast join against the vnode table (metadata-sized model
    // state); everything else is one partial-agg rollup. All integer,
    // bit-exact in the oracle.
    QueryDef(
      "q261_shard_ring",
      (s, dir) => {
        val ring = s.range(80).select(col("id").as("v"),
          Sampling.portableHash(concat(lit("vn:"), col("id"))).as("vpos"),
          expr("id div 16").as("shard"))
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), Sampling.portableHash(col("doc_id")).as("dpos"))
        def owner(nShards: Int) = docs
          .crossJoin(broadcast(ring.where(col("shard") < nShards)))
          .groupBy(col("doc_id"))
          .agg(min_by(col("shard"),
            struct(pmod(col("vpos") - col("dpos"), lit(1152921504606846976L)).as("dist"),
              col("v").as("v"))).as("shard"))
        val before = owner(4).withColumnRenamed("shard", "s_before")
        val after = owner(5).withColumnRenamed("shard", "s_after")
        val j = before.join(after, "doc_id")
        j.groupBy(col("s_before").as("shard"))
          .agg(count(lit(1)).as("n_before"),
            sum(when(col("s_after") =!= col("s_before"), 1L).otherwise(0L))
              .as("n_moved_out"))
          .join(j.groupBy(col("s_after").as("shard"))
              .agg(count(lit(1)).as("n_after")),
            Seq("shard"), "full_outer")
          .select(col("shard"), coalesce(col("n_before"), lit(0L)).as("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"),
            coalesce(col("n_moved_out"), lit(0L)).as("n_moved_out"))
          .orderBy(col("shard"))
      },
      Some("""WITH ring AS (
             |  SELECT v, CAST(('0x' || substring(md5('vn:' || CAST(v AS VARCHAR)),1,15))
             |           AS BIGINT) AS vpos, v // 16 AS shard
             |  FROM range(80) t(v)),
             |docs AS (
             |  SELECT doc_id, CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |           AS BIGINT) AS dpos
             |  FROM documents),
             |ob AS (
             |  SELECT doc_id, shard AS s_before FROM (
             |    SELECT d.doc_id, r.shard,
             |      ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY
             |        ((r.vpos - d.dpos) % 1152921504606846976
             |         + 1152921504606846976) % 1152921504606846976, r.v) AS rn
             |    FROM docs d CROSS JOIN ring r WHERE r.shard < 4) WHERE rn = 1),
             |oa AS (
             |  SELECT doc_id, shard AS s_after FROM (
             |    SELECT d.doc_id, r.shard,
             |      ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY
             |        ((r.vpos - d.dpos) % 1152921504606846976
             |         + 1152921504606846976) % 1152921504606846976, r.v) AS rn
             |    FROM docs d CROSS JOIN ring r WHERE r.shard < 5) WHERE rn = 1),
             |j AS (SELECT ob.doc_id, s_before, s_after FROM ob JOIN oa USING (doc_id)),
             |b AS (SELECT s_before AS shard, COUNT(*)::BIGINT AS n_before,
             |        CAST(SUM(CASE WHEN s_after <> s_before THEN 1 ELSE 0 END)
             |             AS BIGINT) AS n_moved_out
             |      FROM j GROUP BY 1),
             |a AS (SELECT s_after AS shard, COUNT(*)::BIGINT AS n_after
             |      FROM j GROUP BY 1)
             |SELECT COALESCE(b.shard, a.shard) AS shard,
             |  COALESCE(n_before, 0) AS n_before, COALESCE(n_after, 0) AS n_after,
             |  COALESCE(n_moved_out, 0) AS n_moved_out
             |FROM b FULL OUTER JOIN a ON a.shard = b.shard
             |ORDER BY shard""".stripMargin),
    ),

    // Stratified split PLAN with exact global quota: a 10% validation
    // budget (floor of N/10) allocated across (source, lang) strata by
    // largest remainder (the q252 rule — floors first, +1 to the largest
    // remainders until the budget is spent EXACTLY), then assigned
    // within each stratum to the docs with the smallest portable id
    // hash. val_id_sum witnesses the exact assignment, so the oracle
    // checks WHICH docs were picked, not just how many. Stratum windows
    // run over the stratum ROLLUP only; the assignment rank is
    // stratum-keyed.
    QueryDef(
      "q262_stratified_split",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            Sampling.portableHash(col("doc_id")).as("h"))
        val strata = d.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val tot = strata.agg(sum(col("n_docs")).as("n"),
          expr("sum(n_docs) div 10").as("budget"))
        val alloc = strata.crossJoin(broadcast(tot))
          .withColumn("fl", expr("(budget * n_docs) div n"))
          .withColumn("rem", expr("(budget * n_docs) % n"))
          .withColumn("fsum", sum(col("fl")).over(Window.partitionBy(lit(0))))
          .withColumn("rrk", row_number().over(
            Window.orderBy(col("rem").desc, col("source"), col("lang"))).cast("long"))
          .withColumn("n_val",
            col("fl") + when(col("rrk") <= col("budget") - col("fsum"), 1L).otherwise(0L))
        val ranked = d.withColumn("rk", row_number().over(
          Window.partitionBy(col("source"), col("lang"))
            .orderBy(col("h"), col("doc_id"))).cast("long"))
        ranked.join(alloc.select(col("source"), col("lang"), col("n_docs"), col("n_val")),
            Seq("source", "lang"))
          .groupBy(col("source"), col("lang"))
          .agg(max(col("n_docs")).as("n_docs"), max(col("n_val")).as("n_val"),
            sum(when(col("rk") <= col("n_val"), col("doc_id")).otherwise(0L))
              .as("val_id_sum"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lang,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM documents),
             |st AS (SELECT source, lang, COUNT(*)::BIGINT AS n_docs FROM d GROUP BY 1, 2),
             |tt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
             |         CAST(SUM(n_docs) AS BIGINT) // 10 AS budget FROM st),
             |al AS (
             |  SELECT source, lang, n_docs,
             |    (budget * n_docs) // n AS fl, (budget * n_docs) % n AS rem,
             |    CAST(SUM((budget * n_docs) // n) OVER () AS BIGINT) AS fsum,
             |    CAST(ROW_NUMBER() OVER (ORDER BY (budget * n_docs) % n DESC,
             |      source, lang) AS BIGINT) AS rrk,
             |    budget
             |  FROM st CROSS JOIN tt),
             |q AS (
             |  SELECT source, lang, n_docs,
             |    CAST(fl + CASE WHEN rrk <= budget - fsum THEN 1 ELSE 0 END AS BIGINT)
             |      AS n_val
             |  FROM al),
             |r AS (
             |  SELECT doc_id, source, lang,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source, lang
             |      ORDER BY h, doc_id) AS BIGINT) AS rk
             |  FROM d)
             |SELECT r.source AS source, r.lang AS lang,
             |  MAX(q.n_docs) AS n_docs, MAX(q.n_val) AS n_val,
             |  CAST(SUM(CASE WHEN rk <= n_val THEN doc_id ELSE 0 END) AS BIGINT)
             |    AS val_id_sum
             |FROM r JOIN q ON q.source = r.source AND q.lang = r.lang
             |GROUP BY 1, 2 ORDER BY r.source, r.lang""".stripMargin),
    ),

    // Mixture ANNEALING schedule: 4 training phases interpolating the
    // per-source token distribution from NATURAL (phase 0) to fully
    // QUALITY-WEIGHTED (phase 3) — the standard end-of-training
    // upsample-the-good-stuff recipe, as an exact-integer plan. Doc
    // quality rides the q174 ppm scoring; the blend
    // (1e6−α)·tokens + α·(quality-weighted tokens) stays < 2^58, and
    // shares floor to ppm after a documented 1e6 down-scale. One doc
    // rollup + a phases×sources literal expansion (metadata-sized).
    QueryDef(
      "q263_anneal_schedule",
      (s, dir) => {
        val t = TextAnalysis
        val d = tbl(s, dir, "documents")
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .withColumn("q_ppm",
            round(t.qualityScore(col("text"), t.tokenCount(col("text"))) * 1000000)
              .cast("long"))
        val src = d.groupBy(col("source"))
          .agg(sum(col("n_tok")).as("tok"),
            sum(col("n_tok") * col("q_ppm")).as("qtok"))
        val phases = s.range(4).select(col("id").as("phase"),
          (col("id") * 333333L + when(col("id") === 3, 1L).otherwise(0L)).as("alpha"))
        val blended = src.crossJoin(broadcast(phases))
          .withColumn("bw",
            expr("((1000000 - alpha) * tok * 1000000 + alpha * qtok) div 1000000"))
        blended
          .withColumn("bw_sum", sum(col("bw")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("phase"))))
          .select(col("phase"), col("source"), col("tok"),
            expr("(bw * 1000000) div bw_sum").as("share_ppm"))
          .orderBy(col("phase"), col("source"))
      },
      Some(s"""WITH d AS (
              |  SELECT source, CAST(t AS BIGINT) AS n_tok,
              |    CAST(ROUND(ROUND(
              |      LEAST(t / 50.0, 1.0) * 0.4 +
              |      (CAST(len(list_filter(toks, w -> w IN
              |         (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |      CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8
              |           THEN 0.3 ELSE 0.0 END, 6) * 1000000) AS BIGINT) AS q_ppm
              |  FROM (SELECT source, string_split(text,' ') AS toks,
              |               len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |        FROM documents)),
              |src AS (
              |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tok,
              |    CAST(SUM(n_tok * q_ppm) AS BIGINT) AS qtok
              |  FROM d GROUP BY 1),
              |ph AS (SELECT v AS phase,
              |         CAST(v * 333333 + CASE WHEN v = 3 THEN 1 ELSE 0 END AS BIGINT)
              |           AS alpha
              |       FROM range(4) t(v)),
              |bl AS (
              |  SELECT phase, source, tok,
              |    ((1000000 - alpha) * tok * 1000000 + alpha * qtok) // 1000000 AS bw
              |  FROM src CROSS JOIN ph),
              |ws AS (SELECT *, CAST(SUM(bw) OVER (PARTITION BY phase) AS BIGINT)
              |         AS bw_sum FROM bl)
              |SELECT CAST(phase AS BIGINT) AS phase, source, tok,
              |  (bw * 1000000) // bw_sum AS share_ppm
              |FROM ws ORDER BY phase, source""".stripMargin),
    ),

    // Snake-order (boustrophedon) shard balancing — the distributed
    // approximation of LPT bin packing: docs ranked by weight (n_chars)
    // descending, dealt into 8 shards forward then backward per round so
    // heavy items spread and light items backfill. Per-shard load plus
    // signed ppm deviation from the ideal equal split. One global rank
    // (at 100 TB: rank hierarchically — per-partition rank + cumulative
    // partition offsets, the q246 two-level pattern); everything after is
    // an 8-group rollup.
    QueryDef(
      "q290_snake_shards",
      (s, dir) => {
        val W = 8L
        val r = tbl(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
          .withColumn("r",
            row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id")))
              .cast("long") - 1L)
          .select(col("doc_id"), col("n_chars"),
            when(pmod(call_function("div", col("r"), lit(W)), lit(2L)) === 0,
              pmod(col("r"), lit(W)))
              .otherwise(lit(W - 1) - pmod(col("r"), lit(W))).as("shard"))
        val shards = r.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("weight"))
        val tot = shards.agg(sum("weight").as("total"))
        shards.crossJoin(broadcast(tot))
          .select(col("shard"), col("n_docs"), col("weight"),
            expr(s"(weight * $W - total) * 1000000 div total").as("dev_ppm"))
          .orderBy("shard")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, n_chars,
             |    CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END AS shard
             |  FROM r),
             |g AS (SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS weight
             |      FROM sh GROUP BY shard),
             |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total FROM g)
             |SELECT shard, n_docs, weight,
             |  CAST((weight * 8 - total) * 1000000 // total AS BIGINT) AS dev_ppm
             |FROM g CROSS JOIN tot ORDER BY shard""".stripMargin),
    ),

    // DSIR importance-weighted selection (Xie et al. 2023): score every
    // doc by its hashed-unigram log-likelihood ratio between the
    // lang='en' target slice and the whole pool (256 hash buckets,
    // Laplace-smoothed, quarter-bit integer log2 — the q105 no-libm
    // discipline so weights are bit-exact cross-engine), then flag the
    // deterministic top-100 by (weight desc, id). The scale plan:
    // bucket counts broadcast back to the token stream (B = 256 rows),
    // one doc rollup, selection boundary via top-k + broadcast
    // membership flag — never a global sort (Sampling.dsirSelection).
    // The oracle replays the identical quarterLog2 CASE formula.
    QueryDef(
      "q315_dsir_selection",
      (s, dir) => Sampling.dsirSelection(tbl(s, dir, "documents"),
          "text", "doc_id", col("lang") === "en", buckets = 256, take = 100)
        .orderBy(col("doc_id")),
      Some({
        val ql = (x: String) =>
          s"""CASE WHEN length(bin($x)) - 1 <= 14
             |    THEN length(bin($x*$x*$x*$x)) - 1
             |    ELSE 4 * (length(bin($x)) - 15) +
             |         length(bin(($x >> (length(bin($x)) - 15))
             |                   *($x >> (length(bin($x)) - 15))
             |                   *($x >> (length(bin($x)) - 15))
             |                   *($x >> (length(bin($x)) - 15)))) - 1 END""".stripMargin
        s"""WITH tok AS (
           |  SELECT doc_id, is_t,
           |    CAST(('0x' || substring(md5(w),1,15)) AS BIGINT) % 256 AS b
           |  FROM (SELECT doc_id, lang = 'en' AS is_t,
           |               unnest(string_split(text,' ')) AS w FROM documents)),
           |cnt AS (
           |  SELECT b, CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
           |    COUNT(*) AS cnt_r
           |  FROM tok GROUP BY b),
           |tot AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS nt,
           |               CAST(SUM(cnt_r) AS BIGINT) AS nr FROM cnt),
           |args AS (SELECT b, (cnt_t + 1) * (nr + 256) AS xa,
           |                (cnt_r + 1) * (nt + 256) AS xb FROM cnt, tot),
           |sc AS (SELECT b, (${ql("xa")}) - (${ql("xb")}) AS term_q4 FROM args),
           |pd AS (
           |  SELECT tok.doc_id, COUNT(*) AS n_tokens,
           |    CAST(SUM(sc.term_q4) AS BIGINT) AS weight_q4
           |  FROM tok JOIN sc USING (b) GROUP BY tok.doc_id),
           |top AS (SELECT doc_id FROM pd ORDER BY weight_q4 DESC, doc_id LIMIT 100)
           |SELECT doc_id, n_tokens, weight_q4,
           |  doc_id IN (SELECT doc_id FROM top) AS selected
           |FROM pd ORDER BY doc_id""".stripMargin
      }),
    ),
  )
}
