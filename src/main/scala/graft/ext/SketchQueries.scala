package graft.ext

import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Sketches & statistics family (CATALOG.md 'Sketches & statistics'): KMV/HLL/CMS/Misra-Gries, quantiles, robust stats, concentration.
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object SketchQueries {

  def queries: Seq[QueryDef] = Seq(

    // KMV distinct-count sketch over per-lang 3-gram vocabulary: the
    // deterministic (partitioning- and engine-independent) alternative to
    // approx_count_distinct, so the ESTIMATOR itself is oracle-checked.
    // One group-keyed shuffle with bounded O(k) map-side partials; the
    // exact countDistinct column is the accuracy audit.
    QueryDef(
      "q60_kmv_distinct",
      (s, dir) => {
        val grams = tbl(s, dir, "documents")
          .select(col("lang"), split(col("text"), " ").as("toks"))
          .select(col("lang"), explode(TextAnalysis.ngramsFromTokens("toks", 3)).as("g"))
        Sketches.kmvDistinct(grams, "lang", col("g"), 512).orderBy(col("lang"))
      },
      Some("""WITH tok AS (SELECT lang, string_split(text,' ') AS t FROM documents),
             |g AS (SELECT lang, unnest([t[i]||' '||t[i+1]||' '||t[i+2]
             |                           FOR i IN generate_series(1, len(t)-2)]) AS g
             |      FROM tok WHERE len(t) >= 3),
             |h AS (SELECT DISTINCT lang,
             |        CAST(('0x' || substring(md5(g),1,15)) AS BIGINT) AS h FROM g),
             |r AS (SELECT lang, h,
             |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
             |a AS (SELECT lang, COUNT(DISTINCT g) AS n_exact FROM g GROUP BY lang),
             |kth AS (SELECT lang, MAX(h) FILTER (WHERE rn = 512) AS kth_hash,
             |               LEAST(COUNT(*), 512) AS n_sketch
             |        FROM r WHERE rn <= 512 GROUP BY lang)
             |SELECT a.lang, a.n_exact, kth.n_sketch, kth.kth_hash,
             |  CASE WHEN kth.kth_hash IS NOT NULL
             |       THEN 511.0 * 1152921504606846976.0 / kth.kth_hash
             |       ELSE CAST(kth.n_sketch AS DOUBLE) END AS est_distinct
             |FROM a JOIN kth USING (lang) ORDER BY lang""".stripMargin),
    ),


    // Per-group exact top-k (heavy hitters): most frequent tokens per
    // language. The rank window runs over the (group, token) COUNT table
    // (vocabulary-sized), never the raw token stream — the shape that
    // survives 100 TB; deterministic tiebreak on the token itself.
    QueryDef(
      "q61_group_topk",
      (s, dir) => {
        val counts = tbl(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("c").desc, col("w").asc)
        counts.withColumn("rk", row_number().over(win).cast("long"))
          .where(col("rk") <= 5)
          .orderBy(col("lang"), col("rk"))
      },
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text,' ')) AS w FROM documents),
             |c AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
             |r AS (SELECT lang, w, c,
             |        row_number() OVER (PARTITION BY lang ORDER BY c DESC, w ASC) AS rk
             |      FROM c)
             |SELECT lang, w, c, rk FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin),
    ),


    // Windowed cardinality monitoring: daily distinct users via the KMV
    // sketch (estimate oracle-checked bit-for-bit) next to the exact count.
    QueryDef(
      "q71_daily_distinct",
      (s, dir) => {
        val dayNs = 86400L * 1000000000L
        val ev = tbl(s, dir, "events")
          .select(expr(s"ts div $dayNs").as("day"), col("user_id"))
        Sketches.kmvDistinct(ev, "day", col("user_id"), 64).orderBy(col("day"))
      },
      Some("""WITH e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events),
             |h AS (SELECT DISTINCT day,
             |        CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |      FROM e),
             |r AS (SELECT day, h,
             |        row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM h),
             |a AS (SELECT day, COUNT(DISTINCT user_id) AS n_exact FROM e GROUP BY day),
             |kth AS (SELECT day, MAX(h) FILTER (WHERE rn = 64) AS kth_hash,
             |               LEAST(COUNT(*), 64) AS n_sketch
             |        FROM r WHERE rn <= 64 GROUP BY day)
             |SELECT a.day, a.n_exact, kth.n_sketch, kth.kth_hash,
             |  CASE WHEN kth.kth_hash IS NOT NULL
             |       THEN 63.0 * 1152921504606846976.0 / kth.kth_hash
             |       ELSE CAST(kth.n_sketch AS DOUBLE) END AS est_distinct
             |FROM a JOIN kth USING (day) ORDER BY day""".stripMargin),
    ),


    // Guaranteed heavy hitters via a Misra-Gries candidate sketch + bounded
    // exact recount (Sketches.guaranteedHeavyHitters). The sketch itself is
    // order-dependent (no bit-exact oracle exists for its state), but its
    // G3 guarantee makes the OPERATOR deterministic: the output is exactly
    // {token : f(token)*(k+1) > n} with exact counts — which the oracle
    // computes directly. Discovery without shuffling the vocabulary: the
    // exchange moves <= k counters per partition, then <= k candidates
    // broadcast back for the recount.
    QueryDef(
      "q98_guaranteed_heavyhitters",
      (s, dir) => Sketches.guaranteedHeavyHitters(
          tbl(s, dir, "documents").select(explode(split(col("text"), " ")).as("item")),
          col("item"), k = 64)
        .orderBy(col("n_exact").desc, col("item")),
      Some("""WITH tok AS (SELECT unnest(string_split(text,' ')) AS item FROM documents),
             |n AS (SELECT COUNT(*) AS n_total FROM tok)
             |SELECT item, COUNT(*) AS n_exact, n.n_total
             |FROM tok, n GROUP BY item, n.n_total
             |HAVING COUNT(*) * 65 > n.n_total
             |ORDER BY n_exact DESC, item""".stripMargin),
    ),


    // HyperLogLog distinct-order counts per return flag + a merged
    // __all__ rollup (element-wise register max — the lossless
    // hierarchical merge KMV lacks). Registers, dyadic sum, and the one
    // double division are all bit-exact cross-engine (see Sketches.scala);
    // est_distinct is NULL outside the raw regime (v_zero > 0), where KMV
    // is the right sketch. n_exact is the accuracy audit.
    QueryDef(
      "q133_hll_distinct",
      (s, dir) => Sketches.hllDistinct(tbl(s, dir, "lineitem"),
          "l_returnflag", col("l_orderkey"))
        .orderBy(col("grp")),
      Some("""WITH h AS (
             |  SELECT l_returnflag AS grp,
             |    CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM lineitem),
             |r AS (
             |  SELECT grp, h % 64 AS bucket,
             |    CASE WHEN h >> 6 = 0 THEN 55 ELSE 55 - length(bin(h >> 6)) END AS rho
             |  FROM h),
             |regs AS (SELECT grp, bucket, MAX(rho) AS m FROM r GROUP BY grp, bucket),
             |allregs AS (
             |  SELECT grp, bucket, m FROM regs
             |  UNION ALL
             |  SELECT '__all__' AS grp, bucket, MAX(m) AS m FROM regs GROUP BY bucket),
             |grps AS (SELECT DISTINCT grp FROM allregs),
             |dense AS (
             |  SELECT g.grp, s.b AS bucket, COALESCE(a.m, 0) AS m
             |  FROM grps g CROSS JOIN (SELECT unnest(generate_series(0,63)) AS b) s
             |  LEFT JOIN allregs a ON a.grp = g.grp AND a.bucket = s.b),
             |agg AS (
             |  SELECT grp,
             |    CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
             |    CAST(SUM(1::BIGINT << (55 - m)) AS BIGINT) AS s_sum
             |  FROM dense GROUP BY grp),
             |ex AS (
             |  SELECT l_returnflag AS grp, COUNT(DISTINCT l_orderkey) AS n_exact
             |  FROM lineitem GROUP BY 1
             |  UNION ALL
             |  SELECT '__all__', COUNT(DISTINCT l_orderkey) FROM lineitem)
             |SELECT a.grp, a.v_zero, a.s_sum,
             |  CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0 / CAST(a.s_sum AS DOUBLE) AS raw_est,
             |  CASE WHEN a.v_zero = 0
             |       THEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0 / CAST(a.s_sum AS DOUBLE)
             |       END AS est_distinct,
             |  CAST(ex.n_exact AS BIGINT) AS n_exact
             |FROM agg a JOIN ex ON a.grp = ex.grp
             |ORDER BY a.grp""".stripMargin),
    ),


    // Robust per-source length outliers via MAD: dev*10^4 > MAD*22239
    // (1.5 * 1.4826 cross-multiplied to integers — this corpus's length
    // spread sits inside the classic 3-sigma gate) over exact discrete
    // medians — the outlier gate that outliers can't skew, zero floats.
    QueryDef(
      "q153_mad_outliers",
      (s, dir) => CorpusStats.madOutliers(tbl(s, dir, "documents"),
          "text", "source", thrBp = 22239L)
        .orderBy(col("source")),
      Some("""WITH b AS (
             |  SELECT source, CAST(len(string_split(text,' ')) AS BIGINT) AS x
             |  FROM documents),
             |r AS (
             |  SELECT source, x, ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS n
             |  FROM b),
             |med AS (
             |  SELECT source, MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
             |                     THEN x END) AS med
             |  FROM r GROUP BY source),
             |d AS (
             |  SELECT b.source, b.x, abs(b.x - m.med) AS dev, m.med
             |  FROM b JOIN med m ON b.source = m.source),
             |r2 AS (
             |  SELECT source, dev, ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS n
             |  FROM d),
             |mad AS (
             |  SELECT source, MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
             |                     THEN dev END) AS mad
             |  FROM r2 GROUP BY source)
             |SELECT d.source, COUNT(*) AS n_docs, MAX(d.med) AS med,
             |  MAX(mad.mad) AS mad,
             |  CAST(SUM(CASE WHEN d.dev * 10000 > mad.mad * 22239 THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_outliers
             |FROM d JOIN mad ON d.source = mad.source
             |GROUP BY d.source ORDER BY d.source""".stripMargin),
    ),


    // CMS join-cardinality estimation (the AMS inner-product estimator):
    // size |orders JOIN lineitem ON orderkey| from two depth*width counter
    // tables — per-row overestimates, min across rows; exact count audited
    // alongside. The cost-based-planning primitive, all integer. Width
    // 2^16: the collision bias is ~|A|*|B|/width, so 15k x 60k keys need
    // width >> 2^8 for the estimate to be informative (~74k vs 60k exact
    // at sf0.01; 256 gave a useless 3.5M).
    QueryDef(
      "q154_join_size_estimate",
      (s, dir) => {
        val est = Sketches.cmsJoinSizeEstimate(
          tbl(s, dir, "orders"), col("o_orderkey"),
          tbl(s, dir, "lineitem"), col("l_orderkey"), depth = 4, width = 65536)
        val exact = tbl(s, dir, "orders").join(tbl(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("exact"))
        est.crossJoin(broadcast(exact)).orderBy(col("j"))
      },
      Some("""WITH a AS (SELECT o_orderkey AS item FROM orders),
             |b AS (SELECT l_orderkey AS item FROM lineitem),
             |ca AS (
             |  SELECT j, CAST(('0x' || substring(md5(j || ':' || item),1,15))
             |            AS BIGINT) % 65536 AS bucket, COUNT(*) AS ca
             |  FROM a, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
             |cb AS (
             |  SELECT j, CAST(('0x' || substring(md5(j || ':' || item),1,15))
             |            AS BIGINT) % 65536 AS bucket, COUNT(*) AS cb
             |  FROM b, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
             |e AS (
             |  SELECT ca.j, CAST(SUM(ca.ca * cb.cb) AS BIGINT) AS est
             |  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
             |  GROUP BY ca.j),
             |x AS (SELECT COUNT(*) AS exact FROM orders
             |      JOIN lineitem ON o_orderkey = l_orderkey)
             |SELECT e.j, e.est, MIN(e.est) OVER () AS est_min, x.exact
             |FROM e, x ORDER BY e.j""".stripMargin),
    ),


    // Winsorized per-source mean length: token counts clamped to the exact
    // discrete [p10, p90] before averaging — the robust mean that tails
    // can't drag, integer ppm, ceil-rank quantile convention.
    QueryDef(
      "q157_winsorized_mean",
      (s, dir) => CorpusStats.winsorizedMean(tbl(s, dir, "documents"),
          "text", "source")
        .orderBy(col("source")),
      Some("""WITH b AS (
             |  SELECT source, CAST(len(string_split(text,' ')) AS BIGINT) AS x
             |  FROM documents),
             |r AS (
             |  SELECT source, x, ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS n
             |  FROM b),
             |cuts AS (
             |  SELECT source,
             |    MAX(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN x END) AS p10,
             |    MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN x END) AS p90
             |  FROM r GROUP BY source)
             |SELECT b.source, COUNT(*) AS n_docs, MAX(c.p10) AS p10, MAX(c.p90) AS p90,
             |  CAST(SUM(GREATEST(c.p10, LEAST(c.p90, b.x))) AS BIGINT) AS wsum,
             |  (CAST(SUM(GREATEST(c.p10, LEAST(c.p90, b.x))) AS BIGINT) * 1000000)
             |    // COUNT(*) AS wmean_ppm
             |FROM b JOIN cuts c ON b.source = c.source
             |GROUP BY b.source ORDER BY b.source""".stripMargin),
    ),


    // Deterministic half-sample bootstrap CI for per-source mean tokens:
    // 32 hash-membership resamples (no RNG state — reproducible across
    // engines/runs/partitionings), exact rank-5%/95% quantiles of the
    // resample means, integer ppm. Uncertainty quantification as a pure
    // function of the data.
    QueryDef(
      "q170_bootstrap_ci",
      (s, dir) => CorpusStats.bootstrapMeanCI(tbl(s, dir, "documents"),
          "text", "source", "doc_id", b = 32)
        .orderBy(col("source")),
      Some("""WITH base AS (
             |  SELECT source, doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |res AS (
             |  SELECT source, r, COUNT(*) AS m, CAST(SUM(n_tok) AS BIGINT) AS s
             |  FROM base, unnest(generate_series(0, 31)) u(r)
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |    CAST(r AS VARCHAR)),1,15)) AS BIGINT) % 2 = 0
             |  GROUP BY source, r),
             |rm AS (SELECT source, (s * 1000000) // m AS mean_ppm FROM res),
             |rk AS (
             |  SELECT source, mean_ppm,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY mean_ppm) AS BIGINT) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS nb
             |  FROM rm),
             |ci AS (
             |  SELECT source,
             |    MAX(CASE WHEN rn = CAST(ceil(0.05 * nb) AS BIGINT) THEN mean_ppm END) AS boot_lo_ppm,
             |    MAX(CASE WHEN rn = CAST(ceil(0.95 * nb) AS BIGINT) THEN mean_ppm END) AS boot_hi_ppm,
             |    CAST(MAX(nb) AS BIGINT) AS n_resamples
             |  FROM rk GROUP BY source),
             |f AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    (CAST(SUM(n_tok) AS BIGINT) * 1000000) // COUNT(*) AS mean_ppm
             |  FROM base GROUP BY source)
             |SELECT f.source, n_docs, mean_ppm, boot_lo_ppm, boot_hi_ppm, n_resamples
             |FROM f JOIN ci USING (source) ORDER BY f.source""".stripMargin),
    ),


    // KMV set algebra between event types: sketch-estimated user-set
    // union/intersection per type pair from mergeable k-min-values state
    // alone (Beyer et al. inclusion–exclusion) — the "how much do these
    // crawls overlap" answer that never re-touches the item stream; exact
    // intersection rides along as the audit. Estimates are pure functions
    // of the input multiset, so even they are oracle-checked bit-exact.
    QueryDef(
      "q175_kmv_set_algebra",
      (s, dir) => Sketches.kmvSetAlgebra(tbl(s, dir, "events"),
          "event_type", col("user_id"), 256)
        .orderBy(col("grp_a"), col("grp_b")),
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type AS grp,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM events),
             |sk AS (
             |  SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn,
             |    COUNT(*) OVER (PARTITION BY grp) AS nh
             |  FROM h),
             |est AS (
             |  SELECT grp,
             |    CASE WHEN MAX(nh) >= 256
             |      THEN 255.0 * 1152921504606846976.0 / MAX(CASE WHEN rn = 256 THEN h END)
             |      ELSE CAST(MAX(nh) AS DOUBLE) END AS e
             |  FROM sk GROUP BY grp),
             |pairs AS (
             |  SELECT a.grp AS grp_a, b.grp AS grp_b
             |  FROM (SELECT DISTINCT grp FROM h) a
             |  JOIN (SELECT DISTINCT grp FROM h) b ON a.grp < b.grp),
             |uh AS (
             |  SELECT DISTINCT p.grp_a, p.grp_b, h.h
             |  FROM pairs p JOIN h ON h.grp IN (p.grp_a, p.grp_b)),
             |urn AS (
             |  SELECT grp_a, grp_b, h,
             |    ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn,
             |    COUNT(*) OVER (PARTITION BY grp_a, grp_b) AS nh
             |  FROM uh),
             |uest AS (
             |  SELECT grp_a, grp_b,
             |    CASE WHEN MAX(nh) >= 256
             |      THEN 255.0 * 1152921504606846976.0 / MAX(CASE WHEN rn = 256 THEN h END)
             |      ELSE CAST(MAX(nh) AS DOUBLE) END AS est_union
             |  FROM urn GROUP BY grp_a, grp_b),
             |it AS (SELECT DISTINCT event_type AS grp, user_id AS it FROM events),
             |inter AS (
             |  SELECT a.grp AS grp_a, b.grp AS grp_b, COUNT(*) AS n_inter_exact
             |  FROM it a JOIN it b ON a.it = b.it AND a.grp < b.grp
             |  GROUP BY 1, 2)
             |SELECT p.grp_a, p.grp_b, ea.e AS est_a, eb.e AS est_b, u.est_union,
             |  GREATEST(ea.e + eb.e - u.est_union, 0.0) AS est_inter,
             |  CAST(COALESCE(i.n_inter_exact, 0) AS BIGINT) AS n_inter_exact
             |FROM pairs p
             |JOIN est ea ON ea.grp = p.grp_a
             |JOIN est eb ON eb.grp = p.grp_b
             |JOIN uest u ON u.grp_a = p.grp_a AND u.grp_b = p.grp_b
             |LEFT JOIN inter i ON i.grp_a = p.grp_a AND i.grp_b = p.grp_b
             |ORDER BY p.grp_a, p.grp_b""".stripMargin),
    ),


    // Sliding-window HLL: trailing-4-week distinct users per event type
    // at every occupied week, by register fan-out + per-bucket MAX — the
    // rolling-distinct dashboard shape exact counting can't sustain;
    // exact trailing distincts audit alongside, estimates bit-exact.
    QueryDef(
      "q182_sliding_hll",
      (s, dir) => Sketches.slidingHllDistinct(tbl(s, dir, "events"),
          "event_type", col("user_id"), "ts", windowWeeks = 4)
        .orderBy(col("grp"), col("wk")),
      Some("""WITH h AS (
             |  SELECT event_type AS grp, epoch_ns(ts) // 604800000000000 AS wk,
             |    user_id AS it,
             |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM events),
             |occ AS (SELECT DISTINCT grp, wk FROM h),
             |r AS (
             |  SELECT grp, wk, h % 64 AS bucket,
             |    CASE WHEN h >> 6 = 0 THEN 55 ELSE 55 - length(bin(h >> 6)) END AS rho
             |  FROM h),
             |regs AS (SELECT grp, wk, bucket, MAX(rho) AS m FROM r GROUP BY 1, 2, 3),
             |sh AS (
             |  SELECT regs.grp, w2 AS wk, bucket, m
             |  FROM regs, unnest(generate_series(wk, wk + 3)) u(w2)
             |  WHERE EXISTS (SELECT 1 FROM occ o WHERE o.grp = regs.grp AND o.wk = w2)),
             |mg AS (SELECT grp, wk, bucket, MAX(m) AS m FROM sh GROUP BY 1, 2, 3),
             |dense AS (
             |  SELECT o.grp, o.wk, s.b AS bucket, COALESCE(mg.m, 0) AS m
             |  FROM occ o CROSS JOIN (SELECT unnest(generate_series(0,63)) AS b) s
             |  LEFT JOIN mg ON mg.grp = o.grp AND mg.wk = o.wk AND mg.bucket = s.b),
             |agg AS (
             |  SELECT grp, wk,
             |    CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
             |    CAST(SUM(1::BIGINT << (55 - m)) AS BIGINT) AS s_sum
             |  FROM dense GROUP BY 1, 2),
             |du AS (SELECT DISTINCT grp, wk, it FROM h),
             |exsh AS (
             |  SELECT du.grp, w2 AS wk, it
             |  FROM du, unnest(generate_series(wk, wk + 3)) u(w2)
             |  WHERE EXISTS (SELECT 1 FROM occ o WHERE o.grp = du.grp AND o.wk = w2)),
             |ex AS (SELECT grp, wk, COUNT(DISTINCT it) AS n_exact FROM exsh GROUP BY 1, 2)
             |SELECT a.grp, a.wk, a.v_zero, a.s_sum,
             |  CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0 / CAST(a.s_sum AS DOUBLE) AS raw_est,
             |  CASE WHEN a.v_zero = 0
             |       THEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0 / CAST(a.s_sum AS DOUBLE)
             |       END AS est_distinct,
             |  CAST(ex.n_exact AS BIGINT) AS n_exact
             |FROM agg a JOIN ex ON ex.grp = a.grp AND ex.wk = a.wk
             |ORDER BY a.grp, a.wk""".stripMargin),
    ),


    // Zipf exponent audit: integer least-squares slope of the bigram
    // rank-frequency relation in quarter-bit log space (x = qlog2(rank),
    // y = qlog2(count), both ×4). All moments are exact integer sums;
    // the only doubles are the final two divisions — no libm, no
    // truncate-vs-floor hazard (nothing integer-divides). A healthy
    // natural-language corpus slopes near −1; flat slopes flag templated
    // or synthetic text. Vocabulary-sized input (the corpus rollup),
    // single-row output.
    QueryDef(
      "q199_zipf_slope",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(split(col("text"), " ").as("t"))
          .select(explode(when(size(col("t")) >= 2, expr(
            "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
            .otherwise(array().cast("array<string>"))).as("g"))
          .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        val ranked = d.withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("g"))).cast("long"))
        val pts = ranked.select(
          TextAnalysis.quarterLog2(col("rank")).as("x"),
          TextAnalysis.quarterLog2(col("cnt")).as("y"))
        pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
          .select(col("n"), col("slope_num"), col("slope_den"),
            (col("slope_num").cast("double") / col("slope_den").cast("double"))
              .as("slope"))
      },
      Some("""WITH g AS (
             |  SELECT t[i] || ' ' || t[i+1] AS g
             |  FROM (SELECT string_split(text,' ') AS t FROM documents),
             |    unnest(generate_series(1, len(t) - 1)) u(i)),
             |c AS (SELECT g, COUNT(*) AS cnt FROM g GROUP BY g),
             |r AS (SELECT cnt,
             |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, g) AS BIGINT) AS rank
             |      FROM c),
             |p AS (
             |  SELECT
             |    CAST(CASE WHEN length(bin(rank)) - 1 <= 14
             |      THEN length(bin(rank*rank*rank*rank)) - 1
             |      ELSE 4 * (length(bin(rank)) - 15) +
             |           length(bin((rank >> (length(bin(rank)) - 15))
             |                     *(rank >> (length(bin(rank)) - 15))
             |                     *(rank >> (length(bin(rank)) - 15))
             |                     *(rank >> (length(bin(rank)) - 15)))) - 1 END AS BIGINT) AS x,
             |    CAST(CASE WHEN length(bin(cnt)) - 1 <= 14
             |      THEN length(bin(cnt*cnt*cnt*cnt)) - 1
             |      ELSE 4 * (length(bin(cnt)) - 15) +
             |           length(bin((cnt >> (length(bin(cnt)) - 15))
             |                     *(cnt >> (length(bin(cnt)) - 15))
             |                     *(cnt >> (length(bin(cnt)) - 15))
             |                     *(cnt >> (length(bin(cnt)) - 15)))) - 1 END AS BIGINT) AS y
             |  FROM r),
             |m AS (
             |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
             |    CAST(SUM(x*x) AS BIGINT) AS sxx
             |  FROM p)
             |SELECT n, n * sxy - sx * sy AS slope_num,
             |  n * sxx - sx * sx AS slope_den,
             |  CAST(n * sxy - sx * sy AS DOUBLE)
             |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
             |FROM m""".stripMargin),
    ),


    // Token-WEIGHTED length quantiles: the doc length at which half (and
    // 90%) of the corpus TOKENS sit in shorter-or-equal docs — the
    // distribution that matters for packing/training (a token drawn at
    // random comes from a long doc far more often than doc-count
    // percentiles suggest). Cumulative-weight rank with the integer
    // threshold test 100·cumW ≥ p·W; ties broken by doc_id so the picked
    // row is unique cross-engine.
    QueryDef(
      "q217_weighted_quantiles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_tok"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = d
          .withColumn("cumw", sum(col("n_tok")).over(w))
          .withColumn("tw", sum(col("n_tok"))
            .over(Window.partitionBy(col("source"))))
        def pick(p: Int) = cum
          .where(col("cumw") * 100 >= col("tw") * p)
          .groupBy(col("source"))
          .agg(min(struct(col("n_tok").as("v"), col("doc_id").as("d")))("v")
            .as(s"wp$p"))
        cum.groupBy(col("source")).agg(max(col("tw")).as("total_tokens"))
          .join(pick(50), Seq("source"))
          .join(pick(90), Seq("source"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source
             |      ORDER BY n_tok, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
             |    CAST(SUM(n_tok) OVER (PARTITION BY source) AS BIGINT) AS tw
             |  FROM d),
             |p50 AS (
             |  SELECT source, MIN(n_tok) AS wp50 FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY n_tok, doc_id) AS rk
             |    FROM c WHERE cumw * 100 >= tw * 50) WHERE rk = 1 GROUP BY source),
             |p90 AS (
             |  SELECT source, MIN(n_tok) AS wp90 FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY n_tok, doc_id) AS rk
             |    FROM c WHERE cumw * 100 >= tw * 90) WHERE rk = 1 GROUP BY source)
             |SELECT source, MAX(tw) AS total_tokens, MAX(wp50) AS wp50,
             |  MAX(wp90) AS wp90
             |FROM c JOIN p50 USING (source) JOIN p90 USING (source)
             |GROUP BY source ORDER BY source""".stripMargin),
    ),


    // Largest-gap 1-D segmentation (Jenks-style breaks without the
    // quadratic DP): the k−1 biggest gaps in the sorted distinct value
    // axis cut it into k natural clusters — here the account-balance
    // axis into 4 segments, reported as (segment, span, members). Ties
    // on gap size break on position; everything integer (balances scaled
    // to cents).
    QueryDef(
      "q225_jenks_segments",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val v = tbl(s, dir, "customer")
          .select(round(col("c_acctbal") * 100).cast("long").as("cents"))
          .distinct()
        val w = Window.orderBy(col("cents"))
        val gaps = v
          .withColumn("prev", lag(col("cents"), 1).over(w))
          .where(col("prev").isNotNull)
          .select(col("cents").as("break_at"),
            (col("cents") - col("prev")).as("gap"))
        val breaks = gaps.orderBy(col("gap").desc, col("break_at")).limit(3)
          .select(col("break_at"))
        val seg = tbl(s, dir, "customer")
          .select(round(col("c_acctbal") * 100).cast("long").as("cents"))
          .crossJoin(broadcast(breaks.agg(
            sort_array(collect_list(col("break_at"))).as("bks"))))
          .select(col("cents"), expr(
            "aggregate(bks, 0L, (acc, b) -> acc + if(cents >= b, 1L, 0L))")
            .as("segment"))
        seg.groupBy(col("segment"))
          .agg(count(lit(1)).as("members"), min(col("cents")).as("lo_cents"),
            max(col("cents")).as("hi_cents"))
          .orderBy(col("segment"))
      },
      Some("""WITH v AS (
             |  SELECT DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer),
             |g AS (
             |  SELECT cents AS break_at,
             |    cents - LAG(cents) OVER (ORDER BY cents) AS gap
             |  FROM v),
             |bks AS (
             |  SELECT break_at FROM g WHERE gap IS NOT NULL
             |  ORDER BY gap DESC, break_at LIMIT 3),
             |seg AS (
             |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             |    (SELECT COUNT(*) FROM bks
             |     WHERE CAST(round(c_acctbal * 100) AS BIGINT) >= bks.break_at) AS segment
             |  FROM customer)
             |SELECT CAST(segment AS BIGINT) AS segment, COUNT(*) AS members,
             |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
             |FROM seg GROUP BY segment ORDER BY segment""".stripMargin),
    ),


    // Revenue concentration (HHI): per-nation revenue shares squared and
    // summed — the market-concentration scalar in exact-integer ppm-of-
    // ppm form (shares floored to ppm first, so the statistic is a pure
    // function of the integer shares both engines hold; the floor is the
    // documented convention, not noise). One star join + two rollups.
    QueryDef(
      "q228_revenue_hhi",
      (s, dir) => {
        val rev = tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").cast("long").as("nationkey")), Seq("o_custkey"))
          .groupBy(col("nationkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
        rev.crossJoin(broadcast(rev.agg(sum(col("rev_c")).as("tot"))))
          .select(col("nationkey"),
            expr("(rev_c * 1000000) div tot").as("share_ppm"))
          .agg(count(lit(1)).as("n_nations"),
            sum(expr("share_ppm * share_ppm")).as("hhi_ppm2"),
            max(col("share_ppm")).as("top_share_ppm"))
      },
      Some("""WITH rev AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
             |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
             |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
             |  GROUP BY 1),
             |sh AS (
             |  SELECT nationkey,
             |    CAST((rev_c * 1000000) // (SELECT SUM(rev_c) FROM rev) AS BIGINT)
             |      AS share_ppm
             |  FROM rev)
             |SELECT COUNT(*) AS n_nations,
             |  CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS hhi_ppm2,
             |  MAX(share_ppm) AS top_share_ppm
             |FROM sh""".stripMargin),
    ),


    // Activity concentration: share of all events generated by the top
    // decile of users — the workload-skew scalar behind every "will this
    // key distribution break my partitioning" conversation (q144 plans
    // the salting; this measures the phenomenon). Exact rank cutoff
    // ceil(n/10), cross-multiplied integer threshold.
    QueryDef(
      "q245_activity_concentration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val per = tbl(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("c").desc, col("user_id"))
        per
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n_users", count(lit(1)).over(Window.partitionBy()))
          .agg(max(col("n_users")).as("n_users"), sum(col("c")).as("n_events"),
            sum(when(col("rk") * 10 <= col("n_users"), col("c")).otherwise(0L))
              .as("top_decile_events"))
          .select(col("n_users"), col("n_events"), col("top_decile_events"),
            expr("(top_decile_events * 1000000) div n_events")
              .as("concentration_ppm"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
             |rk AS (
             |  SELECT c,
             |    CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rk,
             |    COUNT(*) OVER () AS n_users
             |  FROM per)
             |SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
             |  CAST(SUM(c) AS BIGINT) AS n_events,
             |  CAST(SUM(CASE WHEN rk * 10 <= n_users THEN c ELSE 0 END) AS BIGINT)
             |    AS top_decile_events,
             |  CAST((SUM(CASE WHEN rk * 10 <= n_users THEN c ELSE 0 END) * 1000000)
             |    // SUM(c) AS BIGINT) AS concentration_ppm
             |FROM rk""".stripMargin),
    ),


    // Audience-overlap matrix via KMV theta-sketch intersection: for every
    // event-type pair, the sketch-estimated shared-user count next to the
    // exact intersection and the realized error — the "how big would this
    // join/campaign overlap be" planning primitive, with its accuracy
    // audit built in (house rule: a sketch query always carries its exact
    // companion). k=128 so the sketch path (not the exact-below-k
    // degenerate case) is exercised at the gate sfs. Every value is a
    // pure function of the input multiset — deterministic cross-engine.
    QueryDef(
      "q250_kmv_overlap",
      (s, dir) => Sketches.kmvIntersection(
          tbl(s, dir, "events"), "event_type", col("user_id"), 128)
        .orderBy(col("ga"), col("gb")),
      Some("""WITH dh AS (
             |  SELECT DISTINCT event_type AS g,
             |    CAST(('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM events WHERE user_id IS NOT NULL),
             |km AS MATERIALIZED (
             |  SELECT g, h FROM dh
             |  QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) <= 128),
             |th AS (
             |  SELECT g, CASE WHEN COUNT(*) = 128 THEN MAX(h)
             |                 ELSE 1152921504606846976 END AS theta
             |  FROM km GROUP BY g),
             |pairs AS (
             |  SELECT a.g AS ga, b.g AS gb, LEAST(a.theta, b.theta) AS theta
             |  FROM th a JOIN th b ON a.g < b.g),
             |sc AS (
             |  SELECT p.ga, p.gb, COUNT(*)::BIGINT AS s_cnt
             |  FROM pairs p
             |  JOIN km x ON x.g = p.ga
             |  JOIN km y ON y.g = p.gb AND y.h = x.h
             |  WHERE x.h < p.theta GROUP BY 1, 2),
             |ex AS (
             |  SELECT x.g AS ga, y.g AS gb, COUNT(*)::BIGINT AS n_exact
             |  FROM (SELECT DISTINCT event_type AS g, user_id FROM events
             |        WHERE user_id IS NOT NULL) x
             |  JOIN (SELECT DISTINCT event_type AS g, user_id FROM events
             |        WHERE user_id IS NOT NULL) y
             |    ON x.user_id = y.user_id AND x.g < y.g
             |  GROUP BY 1, 2),
             |fin AS (
             |  SELECT p.ga, p.gb,
             |    CAST((COALESCE(s.s_cnt, 0)::HUGEINT * 1152921504606846976 * 1000)
             |         // p.theta AS BIGINT) AS est_milli,
             |    COALESCE(e.n_exact, 0) AS n_exact
             |  FROM pairs p
             |  LEFT JOIN sc s ON s.ga = p.ga AND s.gb = p.gb
             |  LEFT JOIN ex e ON e.ga = p.ga AND e.gb = p.gb)
             |SELECT ga, gb, est_milli, n_exact,
             |  CASE WHEN n_exact > 0
             |       THEN CAST(ABS(est_milli // 1000 - n_exact) * 1000000 // n_exact AS BIGINT)
             |  END AS err_ppm
             |FROM fin ORDER BY ga, gb""".stripMargin),
    ),

    // IMPORTANCE-WEIGHTED evaluation: re-estimate mean document quality
    // under a UNIFORM-over-sources target distribution from the natural
    // (source-skewed) sample — w(source) = target share / natural share,
    // the inverse-propensity estimate every domain-shifted eval needs.
    // Exact integer end-to-end: shares in ppm, weights in ppm-of-ppm,
    // the two estimates as floor-ppm ratios of BIGINT sums (bounds
    // < 5e17, ANSI-safe). One doc rollup; sources are metadata.
    QueryDef(
      "q265_importance_weighted_eval",
      (s, dir) => {
        val t = TextAnalysis
        val d = tbl(s, dir, "documents")
          .select(col("source"),
            round(t.qualityScore(col("text"), t.tokenCount(col("text"))) * 1000000)
              .cast("long").as("q_ppm"))
        val src = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_s"), sum(col("q_ppm")).as("qs"))
        val tot = src.agg(sum(col("n_s")).as("n"),
          count(lit(1)).as("n_sources"))
        src.crossJoin(broadcast(tot))
          .withColumn("natural_ppm", expr("(n_s * 1000000) div n"))
          .withColumn("w_ppm",
            expr("((1000000 div n_sources) * 1000000) div natural_ppm"))
          .agg(max(col("n")).as("n_docs"), max(col("n_sources")).as("n_sources"),
            expr("sum(qs) div max(n)").as("est_natural_ppm"),
            expr("sum((qs div n_s) * w_ppm) div sum(w_ppm)").as("est_weighted_ppm"))
      },
      Some(s"""WITH d AS (
              |  SELECT source, CAST(ROUND(ROUND(
              |    LEAST(t / 50.0, 1.0) * 0.4 +
              |    (CAST(len(list_filter(toks, w -> w IN
              |       (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |    CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8
              |         THEN 0.3 ELSE 0.0 END, 6) * 1000000) AS BIGINT) AS q_ppm
              |  FROM (SELECT source, string_split(text,' ') AS toks,
              |               len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |        FROM documents)),
              |src AS (SELECT source, COUNT(*)::BIGINT AS n_s,
              |          CAST(SUM(q_ppm) AS BIGINT) AS qs FROM d GROUP BY 1),
              |tt AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
              |         COUNT(*)::BIGINT AS n_sources FROM src),
              |w AS (
              |  SELECT n, n_sources, n_s, qs,
              |    ((1000000 // n_sources) * 1000000)
              |      // ((n_s * 1000000) // n) AS w_ppm
              |  FROM src CROSS JOIN tt)
              |SELECT MAX(n) AS n_docs, MAX(n_sources) AS n_sources,
              |  CAST(SUM(qs) // MAX(n) AS BIGINT) AS est_natural_ppm,
              |  CAST(SUM((qs // n_s) * w_ppm) // SUM(w_ppm) AS BIGINT)
              |    AS est_weighted_ppm
              |FROM w""".stripMargin),
    ),

    // Table statistics PROFILE (the ANALYZE TABLE analog a CBO feeds on):
    // per lineitem column — null count, exact distinct count, numeric
    // min/max (null for strings) and lexicographic min/max (null for
    // numerics), the timestamp column as epoch micros. Each column is
    // its own pruned single-column scan (ReadSchema carries exactly one
    // field — the profiler costs one column's IO per column, never a
    // full-width pass), partial-agg'd; the profile table itself is
    // metadata.
    QueryDef(
      "q271_table_profile",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        def num(name: String, c: org.apache.spark.sql.Column) =
          li.select(c.as("v")).agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).cast("double").as("min_num"),
            max(col("v")).cast("double").as("max_num"))
          .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_num"), col("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))
        def str(name: String) =
          li.select(col(name).as("v")).agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("min_str"), max(col("v")).as("max_str"))
          .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"), col("min_str"), col("max_str"))
        num("l_quantity", col("l_quantity"))
          .unionByName(num("l_extendedprice", col("l_extendedprice")))
          .unionByName(num("l_discount", col("l_discount")))
          .unionByName(num("l_shipdate",
            expr("unix_micros(cast(l_shipdate as timestamp))")))
          .unionByName(str("l_returnflag"))
          .unionByName(str("l_linestatus"))
          .orderBy(col("col_name"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'l_quantity' AS col_name, COUNT(*)::BIGINT AS n_rows,
             |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |    COUNT(DISTINCT l_quantity)::BIGINT AS n_distinct,
             |    CAST(MIN(l_quantity) AS DOUBLE) AS min_num,
             |    CAST(MAX(l_quantity) AS DOUBLE) AS max_num,
             |    NULL AS min_str, NULL AS max_str FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', COUNT(*)::BIGINT,
             |    CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    COUNT(DISTINCT l_extendedprice)::BIGINT,
             |    CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
             |    NULL, NULL FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', COUNT(*)::BIGINT,
             |    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    COUNT(DISTINCT l_discount)::BIGINT,
             |    CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
             |    NULL, NULL FROM lineitem
             |  UNION ALL
             |  SELECT 'l_shipdate', COUNT(*)::BIGINT,
             |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    COUNT(DISTINCT l_shipdate)::BIGINT,
             |    CAST(MIN(epoch_us(l_shipdate)) AS DOUBLE),
             |    CAST(MAX(epoch_us(l_shipdate)) AS DOUBLE),
             |    NULL, NULL FROM lineitem
             |  UNION ALL
             |  SELECT 'l_returnflag', COUNT(*)::BIGINT,
             |    CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    COUNT(DISTINCT l_returnflag)::BIGINT, NULL, NULL,
             |    MIN(l_returnflag), MAX(l_returnflag) FROM lineitem
             |  UNION ALL
             |  SELECT 'l_linestatus', COUNT(*)::BIGINT,
             |    CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    COUNT(DISTINCT l_linestatus)::BIGINT, NULL, NULL,
             |    MIN(l_linestatus), MAX(l_linestatus) FROM lineitem)
             |ORDER BY col_name""".stripMargin),
    ),

    // EXACT daily distinct users via bitmask packing (q71's exact
    // sibling for BOUNDED id domains — Sketches.bitmapDistinct): ids
    // pack 64-per-long into (day, id div 64) bit_or words, one
    // bit_count sum per day — a 64× exchange reduction over shuffling
    // distinct (day, user) pairs in the dense regime. The oracle is the
    // INDEPENDENT derivation (COUNT(DISTINCT user_id) + distinct word
    // count), so a pass proves the bitmap math exact rather than
    // replaying it.
    QueryDef(
      "q321_bitmap_distinct",
      (s, dir) => {
        val dayNs = 86400L * 1000000000L
        val ev = tbl(s, dir, "events")
          .select(expr(s"ts div $dayNs").as("day"), col("user_id"))
        Sketches.bitmapDistinct(ev, "day", col("user_id"))
          .withColumnRenamed("grp", "day")
          .withColumnRenamed("n_distinct", "n_users")
          .orderBy(col("day"))
      },
      Some("""WITH e AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events)
             |SELECT day, COUNT(DISTINCT user_id)::BIGINT AS n_users,
             |  COUNT(DISTINCT user_id // 64)::BIGINT AS n_words
             |FROM e GROUP BY day ORDER BY day""".stripMargin),
    ),
  )
}
