package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Events / behavioral family (CATALOG.md 'Events / behavioral'): funnels, cohorts, anomalies, seasonality, stationary chains, growth accounting.
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object EventQueries {

  def queries: Seq[QueryDef] = Seq(

    // Two-stage conversion funnel with time-to-convert: first signup per
    // user, earliest purchase within 6h of it. Anchor and ttc are both
    // map-side-combinable mins; the attach is a user-keyed equi-join with
    // the window bounds as join predicates — no global sort, no window
    // function, partitions by user at any scale.
    QueryDef(
      "q131_event_funnel",
      (s, dir) => EventFunnel.conversionFunnel(tbl(s, dir, "events"),
          "signup", "purchase", windowNs = 21600000000000L)
        .orderBy(col("user_id")),
      Some("""WITH s AS (
             |  SELECT user_id, MIN(epoch_ns(ts)) AS s_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |j AS (
             |  SELECT s.user_id, s.s_ts, MIN(epoch_ns(e.ts) - s.s_ts) AS ttc_ns
             |  FROM s LEFT JOIN events e ON e.user_id = s.user_id
             |    AND e.event_type = 'purchase'
             |    AND epoch_ns(e.ts) > s.s_ts
             |    AND epoch_ns(e.ts) <= s.s_ts + 21600000000000
             |  GROUP BY s.user_id, s.s_ts)
             |SELECT user_id, s_ts, ttc_ns IS NOT NULL AS converted, ttc_ns
             |FROM j ORDER BY user_id""".stripMargin),
    ),


    // Crawl-overlap matrix: exact pairwise Jaccard between SOURCES over
    // their distinct 3-shingle sets (complete upper triangle, zero
    // intersections included) — the before-any-doc-dedup planning rollup.
    // Spark shuffles int64 gram hashes; the oracle recomputes on string
    // shingles (the hashedShingleSets collision argument). jaccard in
    // integer ppm.
    QueryDef(
      "q141_source_similarity",
      (s, dir) => CorpusStats.sourceSimilarityMatrix(
          tbl(s, dir, "documents"), "text", "source")
        .orderBy(col("src_a"), col("src_b")),
      Some("""WITH t AS (
             |  SELECT source, string_split(text,' ') AS tokens FROM documents),
             |g AS (
             |  SELECT DISTINCT source,
             |    tokens[i]||' '||tokens[i+1]||' '||tokens[i+2] AS gram
             |  FROM (SELECT source, tokens,
             |          unnest(generate_series(1, len(tokens)-2)) AS i
             |        FROM t WHERE len(tokens) >= 3)),
             |sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
             |co AS (
             |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
             |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
             |  GROUP BY a.source, b.source),
             |pairs AS (
             |  SELECT x.source AS src_a, y.source AS src_b, x.n AS n_a, y.n AS n_b
             |  FROM sz x JOIN sz y ON x.source < y.source)
             |SELECT p.src_a, p.src_b, p.n_a, p.n_b,
             |  CAST(COALESCE(co.inter, 0) AS BIGINT) AS inter,
             |  (CAST(COALESCE(co.inter, 0) AS BIGINT) * 1000000)
             |    // (p.n_a + p.n_b - COALESCE(co.inter, 0)) AS jaccard_ppm
             |FROM pairs p LEFT JOIN co ON p.src_a = co.src_a AND p.src_b = co.src_b
             |ORDER BY p.src_a, p.src_b""".stripMargin),
    ),


    // Shuffle-skew audit + salting plan on the event-type key: hot keys
    // (>= 1% of rows) with the salt factor that caps per-task load at
    // 1000 rows — the pre-shuffle planning query. One partial-agg count +
    // a 1-row total broadcast; integer ppm/ceil math throughout.
    QueryDef(
      "q144_skew_audit",
      (s, dir) => Skew.skewAudit(tbl(s, dir, "events"), "event_type",
          targetPerTask = 1000L, thresholdPpm = 10000L)
        .orderBy(col("cnt").desc, col("key")),
      Some("""WITH c AS (
             |  SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY event_type),
             |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
             |SELECT key, cnt, (cnt * 1000000) // t.total AS share_ppm,
             |  (cnt + 999) // 1000 AS salt
             |FROM c, t
             |WHERE (cnt * 1000000) // t.total >= 10000
             |ORDER BY cnt DESC, key""".stripMargin),
    ),


    // Four-stage ordered funnel signup -> view -> click -> purchase inside
    // a 24h window from the anchor: per anchored user, each stage's first
    // qualifying nanos (nulls cascade) + stages_reached. Each stage is one
    // user-keyed left join + partial-agg min — q131's shape, iterated.
    QueryDef(
      "q149_staged_funnel",
      (s, dir) => EventFunnel.stagedFunnel(tbl(s, dir, "events"),
          Seq("signup", "view", "click", "purchase"), windowNs = 86400000000000L)
        .orderBy(col("user_id")),
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |s2 AS (
             |  SELECT s1.user_id, s1.t1, MIN(epoch_ns(e.ts)) AS t2
             |  FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
             |    AND e.event_type = 'view' AND epoch_ns(e.ts) > s1.t1
             |    AND epoch_ns(e.ts) <= s1.t1 + 86400000000000
             |  GROUP BY s1.user_id, s1.t1),
             |s3 AS (
             |  SELECT s2.user_id, s2.t1, s2.t2, MIN(epoch_ns(e.ts)) AS t3
             |  FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
             |    AND e.event_type = 'click' AND epoch_ns(e.ts) > s2.t2
             |    AND epoch_ns(e.ts) <= s2.t1 + 86400000000000
             |  GROUP BY s2.user_id, s2.t1, s2.t2),
             |s4 AS (
             |  SELECT s3.user_id, s3.t1, s3.t2, s3.t3, MIN(epoch_ns(e.ts)) AS t4
             |  FROM s3 LEFT JOIN events e ON e.user_id = s3.user_id
             |    AND e.event_type = 'purchase' AND epoch_ns(e.ts) > s3.t3
             |    AND epoch_ns(e.ts) <= s3.t1 + 86400000000000
             |  GROUP BY s3.user_id, s3.t1, s3.t2, s3.t3)
             |SELECT user_id, t1, t2, t3, t4,
             |  CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
             |         + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
             |         + (CASE WHEN t4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS stages_reached
             |FROM s4 ORDER BY user_id""".stripMargin),
    ),


    // Hourly rate-burst monitor per event type: n*24 > 3*trailing-24h-sum
    // in cross-multiplied integers; RANGE window over hour values so
    // silent hours shorten the baseline; first 24h never flag. The ingest
    // anomaly monitor.
    QueryDef(
      "q152_hourly_bursts",
      (s, dir) => EventFunnel.hourlyBursts(tbl(s, dir, "events"),
          epochNs = 1704067200000000000L, factor = 3)
        .orderBy(col("event_type"), col("hr")),
      Some("""WITH c AS (
             |  SELECT event_type,
             |    (epoch_ns(ts) - 1704067200000000000) // 3600000000000 AS hr,
             |    COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |w AS (
             |  SELECT event_type, hr, n,
             |    COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY hr
             |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS trail,
             |    MIN(hr) OVER (PARTITION BY event_type) AS fh
             |  FROM c)
             |SELECT event_type, hr, n, CAST(trail AS BIGINT) AS trail,
             |  (hr >= fh + 24 AND n * 24 > trail * 3) AS burst
             |FROM w ORDER BY event_type, hr""".stripMargin),
    ),


    // User-journey path mining: top-20 event-type trigram sequences over
    // per-user time-ordered streams (overlapping windows, lead-based — no
    // self-join). The sequence-level complement to q149's fixed funnel.
    QueryDef(
      "q159_path_mining",
      (s, dir) => EventFunnel.pathCounts(tbl(s, dir, "events"), n = 3, topK = 20),
      Some("""WITH o AS (
             |  SELECT user_id, event_type AS t0,
             |    LEAD(event_type, 1) OVER w AS t1,
             |    LEAD(event_type, 2) OVER w AS t2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
             |SELECT t0 || ' > ' || t1 || ' > ' || t2 AS path, COUNT(*) AS n_paths
             |FROM o WHERE t1 IS NOT NULL AND t2 IS NOT NULL
             |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20""".stripMargin),
    ),


    // Percentile-rank quality calibration across sources: each doc's
    // WITHIN-SOURCE rank ppm of its q32 quality score (SQL rank() — ties
    // share a value, no tie-break), so heterogeneous sources become
    // comparable before mixture/curation cuts.
    QueryDef(
      "q174_rank_normalize",
      (s, dir) => CorpusStats.rankNormalizeScores(tbl(s, dir, "documents"),
          "text", "source", "doc_id")
        .orderBy(col("doc_id")),
      Some(s"""WITH q AS (
              |  SELECT doc_id, source, ROUND(
              |    LEAST(t / 50.0, 1.0) * 0.4 +
              |    (CAST(len(list_filter(tokens, w -> w IN
              |       (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |    CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8 THEN 0.3 ELSE 0.0 END,
              |    6) AS quality
              |  FROM (SELECT doc_id, source, string_split(text,' ') AS tokens,
              |               len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |        FROM documents)),
              |r AS (
              |  SELECT doc_id, source, quality,
              |    CAST(RANK() OVER (PARTITION BY source ORDER BY quality) AS BIGINT) AS rk,
              |    COUNT(*) OVER (PARTITION BY source) AS n
              |  FROM q)
              |SELECT doc_id, source, quality,
              |  CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1) ELSE 0 END AS rank_ppm
              |FROM r ORDER BY doc_id""".stripMargin),
    ),


    // Integer EWMA baseline + burst flags per event type at week grain:
    // s_t = (3*s_{t-1} + n_t) div 4 run inside a weeks-sized array per
    // type (metadata rollup, no event-stream window); week t flags when
    // n_t > 2*s_{t-1}. The O(1)-state temporal smoother — also the
    // streaming-state shape.
    QueryDef(
      "q181_ewma_bursts",
      (s, dir) => EventFunnel.ewmaBursts(tbl(s, dir, "events"), factor = 2)
        .orderBy(col("event_type"), col("wk")),
      Some("""WITH RECURSIVE c AS (
             |  SELECT event_type, epoch_ns(ts) // 604800000000000 AS wk, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |w AS (
             |  SELECT event_type, wk, n,
             |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY wk) AS rn
             |  FROM c),
             |r(event_type, rn, wk, n, s) AS (
             |  SELECT event_type, rn, wk, n, n FROM w WHERE rn = 1
             |  UNION ALL
             |  SELECT w.event_type, w.rn, w.wk, w.n, (3 * r.s + w.n) // 4
             |  FROM r JOIN w ON w.event_type = r.event_type AND w.rn = r.rn + 1)
             |SELECT event_type, wk, n, s AS ewma,
             |  COALESCE(n > 2 * lag(s) OVER (PARTITION BY event_type ORDER BY rn),
             |           FALSE) AS burst
             |FROM r ORDER BY event_type, wk""".stripMargin),
    ),


    // Weekly × event-type PIVOT matrix: the wide-format activity report —
    // Spark's relational pivot operator (groupBy().pivot() with an
    // explicit value list, so no discovery job and a fixed schema) over
    // the week bucket. Map-side partial counts; one (wk)-keyed shuffle.
    QueryDef(
      "q189_pivot_matrix",
      (s, dir) => tbl(s, dir, "events")
        .select(expr("ts div 604800000000000").as("wk"), col("event_type"))
        .groupBy(col("wk"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("wk"), col("click"), col("error"), col("purchase"),
          col("signup"), col("view"),
          (col("click") + col("error") + col("purchase") + col("signup") +
            col("view")).as("total"))
        .orderBy(col("wk")),
      Some("""SELECT epoch_ns(ts) // 604800000000000 AS wk,
             |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
             |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
             |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
             |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
             |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
             |  CAST(COUNT(*) AS BIGINT) AS total
             |FROM events GROUP BY 1 ORDER BY wk""".stripMargin),
    ),


    // Greedy set-cover corpus selection over per-doc distinct BIGRAMS:
    // up to 8 picks, each the doc covering the most uncovered bigrams
    // (ties to smallest doc_id). The oracle replays the same greedy run
    // as a recursive CTE carrying the covered set.
    QueryDef(
      "q190_set_cover",
      (s, dir) => Selection.greedyCover(s,
          Selection.docBigrams(tbl(s, dir, "documents"), "doc_id", "text"),
          maxRounds = 8)
        .orderBy(col("round")),
      Some("""WITH RECURSIVE dt AS (
             |  SELECT doc_id, list_sort(list_distinct(
             |    [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)])) AS toks
             |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
             |sel(r, doc_id, gain, covered) AS (
             |  SELECT 1, doc_id, CAST(len(toks) AS BIGINT), toks FROM (
             |    SELECT doc_id, toks FROM dt ORDER BY len(toks) DESC, doc_id LIMIT 1)
             |  UNION ALL
             |  SELECT s.r + 1, d.doc_id,
             |    CAST(len(list_filter(d.toks, t -> NOT list_contains(s.covered, t))) AS BIGINT),
             |    list_sort(list_distinct(flatten([s.covered, d.toks])))
             |  FROM sel s CROSS JOIN dt d
             |  WHERE s.r < 8
             |  QUALIFY ROW_NUMBER() OVER (ORDER BY
             |      len(list_filter(d.toks, t -> NOT list_contains(s.covered, t))) DESC,
             |      d.doc_id) = 1
             |    AND len(list_filter(d.toks, t -> NOT list_contains(s.covered, t))) > 0)
             |SELECT CAST(r AS BIGINT) AS round, CAST(doc_id AS BIGINT) AS doc_id, gain
             |FROM sel ORDER BY round""".stripMargin),
    ),


    // Seasonal weekday-slot baseline anomaly: per (event_type, day-of-week
    // slot, hour), the all-weeks total is the baseline; a concrete
    // (day, hour) cell is anomalous when its count exceeds 2× the
    // baseline's per-day average — tested as the cross-multiplied INTEGER
    // inequality cnt·n_days > 2·total (no float rates). Day slot =
    // epoch-day mod 7: pure integer calendar both engines share.
    QueryDef(
      "q191_weekday_anomaly",
      (s, dir) => {
        val cells = tbl(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            expr("(ts div 3600000000000) % 24").as("hr"))
          .groupBy(col("event_type"), col("day"), col("hr"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("slot", col("day") % 7)
        val base = cells.groupBy(col("event_type"), col("slot"), col("hr"))
          .agg(sum(col("cnt")).as("total"))
        val nDays = tbl(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day")).distinct()
          .withColumn("slot", col("day") % 7)
          .groupBy(col("slot")).agg(count(lit(1)).as("n_days"))
        cells.join(base, Seq("event_type", "slot", "hr"))
          .join(broadcast(nDays), Seq("slot"))
          .where(col("cnt") * col("n_days") > col("total") * 2)
          .select(col("event_type"), col("day"), col("hr"), col("cnt"),
            col("total"), col("n_days"))
          .orderBy(col("event_type"), col("day"), col("hr"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             |    (epoch_ns(ts) // 3600000000000) % 24 AS hr, COUNT(*) AS cnt
             |  FROM events GROUP BY 1, 2, 3),
             |c2 AS (SELECT *, day % 7 AS slot FROM cells),
             |base AS (
             |  SELECT event_type, slot, hr, SUM(cnt) AS total
             |  FROM c2 GROUP BY 1, 2, 3),
             |nd AS (
             |  SELECT day % 7 AS slot, COUNT(*) AS n_days FROM (
             |    SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day FROM events)
             |  GROUP BY 1)
             |SELECT event_type, day, hr, CAST(cnt AS BIGINT) AS cnt,
             |  CAST(total AS BIGINT) AS total, CAST(n_days AS BIGINT) AS n_days
             |FROM c2 JOIN base USING (event_type, slot, hr) JOIN nd USING (slot)
             |WHERE cnt * n_days > total * 2
             |ORDER BY event_type, day, hr""".stripMargin),
    ),


    // Fano-factor burstiness: per event type, the index of dispersion of
    // hourly counts over the type's own hour span (zero hours included —
    // they contribute nothing to the sums but widen n). Exact integer:
    // D = var/mean = (n·Σc² − (Σc)²) / (n·Σc), emitted as floor ppm;
    // > 10^6 = overdispersed (bursty), < 10^6 = more regular than
    // Poisson. Cross-multiplied products stay < 2^63 up to ~3·10⁹ events
    // per type (the q110 bound; decimal(38) is the documented switch).
    QueryDef(
      "q193_fano_dispersion",
      (s, dir) => tbl(s, dir, "events")
        .select(col("event_type"), expr("ts div 3600000000000").as("hr"))
        .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg((max(col("hr")) - min(col("hr")) + 1).as("n_hours"),
          sum(col("c")).as("total"), sum(col("c") * col("c")).as("s2"))
        .select(col("event_type"), col("n_hours"), col("total"),
          expr("((n_hours * s2 - total * total) * 1000000) div (n_hours * total)")
            .as("fano_ppm"))
        .orderBy(col("event_type")),
      Some("""WITH h AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type,
             |  MAX(hr) - MIN(hr) + 1 AS n_hours,
             |  CAST(SUM(c) AS BIGINT) AS total,
             |  CAST(((MAX(hr) - MIN(hr) + 1) * CAST(SUM(c*c) AS BIGINT)
             |    - CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT)) * 1000000
             |    // ((MAX(hr) - MIN(hr) + 1) * CAST(SUM(c) AS BIGINT)) AS BIGINT) AS fano_ppm
             |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),


    // Inter-event gap spectrum: per type, consecutive-event gaps (arrival
    // order = (ts, event_id)) binned by quarter-bit log2 of the gap in ns
    // — the integer-exact latency/cadence histogram (quarterLog2: zero
    // libm, bit-exact cross-engine). One window pass + one rollup.
    QueryDef(
      "q194_gap_spectrum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        tbl(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"))
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
          .where(col("gap").isNotNull)
          .select(col("event_type"),
            TextAnalysis.quarterLog2(col("gap") + 1).as("bin"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             |      PARTITION BY event_type ORDER BY epoch_ns(ts), event_id) + 1 AS gp
             |  FROM events)
             |SELECT event_type,
             |  CAST(CASE WHEN length(bin(gp)) - 1 <= 14
             |    THEN length(bin(gp*gp*gp*gp)) - 1
             |    ELSE 4 * (length(bin(gp)) - 15) +
             |         length(bin((gp >> (length(bin(gp)) - 15))
             |                   *(gp >> (length(bin(gp)) - 15))
             |                   *(gp >> (length(bin(gp)) - 15))
             |                   *(gp >> (length(bin(gp)) - 15)))) - 1 END AS BIGINT) AS bin,
             |  COUNT(*) AS n
             |FROM g WHERE gp IS NOT NULL
             |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin),
    ),


    // Growth accounting: per week, every active user classified as NEW
    // (first-ever week), RETAINED (active last week too) or RESURRECTED
    // (active before, but not last week); churned = last week's actives
    // who vanished. The product-analytics decomposition (q67's cohort
    // matrix collapsed into per-week flows). Two user-keyed windows over
    // the (user, week) distinct rollup, then a week rollup — all counts.
    QueryDef(
      "q198_growth_accounting",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val uw = tbl(s, dir, "events")
          .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
        val flagged = uw
          .withColumn("prev_wk", lag(col("wk"), 1).over(w))
          .withColumn("cls",
            when(col("prev_wk").isNull, lit("new"))
              .when(col("prev_wk") === col("wk") - 1, lit("retained"))
              .otherwise(lit("resurrected")))
        val flows = flagged.groupBy(col("wk"))
          .agg(count(lit(1)).as("active"),
            sum(when(col("cls") === "new", 1L).otherwise(0L)).as("new_users"),
            sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("retained"),
            sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
              .as("resurrected"))
        // churned(w) = active(w-1) - retained(w): last week's actives who
        // didn't return — derived from the rollup, no third window
        flows.as("a")
          .join(flows.select(col("wk") + 1 as "wk", col("active").as("prev_active"))
            .as("b"), Seq("wk"), "left_outer")
          .select(col("wk"), col("active"), col("new_users"), col("retained"),
            col("resurrected"),
            coalesce(col("prev_active") - col("retained"), lit(0L)).as("churned"))
          .orderBy(col("wk"))
      },
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk
             |  FROM events),
             |f AS (
             |  SELECT wk,
             |    CASE WHEN LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) IS NULL
             |           THEN 'new'
             |         WHEN LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) = wk - 1
             |           THEN 'retained'
             |         ELSE 'resurrected' END AS cls
             |  FROM uw),
             |flows AS (
             |  SELECT wk, COUNT(*) AS active,
             |    CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             |    CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
             |    CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
             |  FROM f GROUP BY wk)
             |SELECT a.wk, a.active, a.new_users, a.retained, a.resurrected,
             |  COALESCE(b.active - a.retained, 0) AS churned
             |FROM flows a LEFT JOIN flows b ON b.wk = a.wk - 1
             |ORDER BY a.wk""".stripMargin),
    ),


    // CUBE grouping sets: all four aggregation granularities of
    // (event_type, week) in one pass — the completion of q38's ROLLUP
    // row. grouping_id disambiguates the null-as-total rows exactly as
    // the SQL standard does; Spark plans one Expand + one aggregate
    // (rows ×4 map-side, partial-agg combinable).
    QueryDef(
      "q203_cube",
      (s, dir) => tbl(s, dir, "events")
        .select(col("event_type"), expr("ts div 604800000000000").as("wk"))
        .cube(col("event_type"), col("wk"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("event_type"), col("wk")),
      Some("""SELECT event_type, epoch_ns(ts) // 604800000000000 AS wk,
             |  COUNT(*) AS n,
             |  CAST(GROUPING(event_type, epoch_ns(ts) // 604800000000000) AS BIGINT) AS gid
             |FROM events
             |GROUP BY CUBE (event_type, epoch_ns(ts) // 604800000000000)
             |ORDER BY gid, event_type NULLS FIRST, wk NULLS FIRST""".stripMargin),
    ),


    // DAU/WAU stickiness: per week, the summed daily distinct users over
    // the week's distinct users, as the integer ppm
    // (Σ_day dau · 10⁶) div (n_days · wau) — "how many of the week's
    // actives show up on an average day". Two distinct rollups, no
    // window. (Σdau counts each user once per active day, so the ratio
    // is avg-DAU / WAU exactly.)
    QueryDef(
      "q207_stickiness",
      (s, dir) => {
        val ud = tbl(s, dir, "events")
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .distinct()
          .withColumn("wk", expr("day div 7"))
        val daily = ud.groupBy(col("wk"), col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
          .groupBy(col("wk"))
          .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
        val weekly = ud.groupBy(col("wk"))
          .agg(countDistinct(col("user_id")).as("wau"))
        daily.join(weekly, Seq("wk"))
          .select(col("wk"), col("n_days"), col("sum_dau"), col("wau"),
            expr("(sum_dau * 1000000) div (n_days * wau)").as("stickiness_ppm"))
          .orderBy(col("wk"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |u2 AS (SELECT user_id, day, day // 7 AS wk FROM ud),
             |d AS (
             |  SELECT wk, CAST(SUM(dau) AS BIGINT) AS sum_dau, COUNT(*) AS n_days
             |  FROM (SELECT wk, day, COUNT(DISTINCT user_id) AS dau
             |        FROM u2 GROUP BY wk, day)
             |  GROUP BY wk),
             |w AS (SELECT wk, COUNT(DISTINCT user_id) AS wau FROM u2 GROUP BY wk)
             |SELECT wk, CAST(n_days AS BIGINT) AS n_days, sum_dau,
             |  CAST(wau AS BIGINT) AS wau,
             |  CAST((sum_dau * 1000000) // (n_days * wau) AS BIGINT) AS stickiness_ppm
             |FROM d JOIN w USING (wk) ORDER BY wk""".stripMargin),
    ),


    // (type × hour-of-day) independence anomaly: lift of each cell vs
    // the product of its margins, the integer cross-multiplied
    // chi-square cousin — lift_ppm = (obs·total·10⁶) div (row·col).
    // Cells far from 10⁶ are schedule-coupled behavior (cron-driven
    // errors, business-hours purchases). Margins are broadcast-sized;
    // one (type, hour) rollup, all integer.
    QueryDef(
      "q208_hour_lift",
      (s, dir) => {
        val cells = PinnedCache.pin(tbl(s, dir, "events")
          .select(col("event_type"),
            expr("(ts div 3600000000000) % 24").as("hod"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("obs")))
        val rowM = cells.groupBy(col("event_type")).agg(sum(col("obs")).as("row_n"))
        val colM = cells.groupBy(col("hod")).agg(sum(col("obs")).as("col_n"))
        val tot = cells.agg(sum(col("obs")).as("total"))
        cells
          .join(broadcast(rowM), Seq("event_type"))
          .join(broadcast(colM), Seq("hod"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("hod"), col("obs"),
            expr("(obs * total * 1000000) div (row_n * col_n)").as("lift_ppm"))
          .where(expr("abs(lift_ppm - 1000000) > 200000"))
          .orderBy(col("event_type"), col("hod"))
      },
      Some("""WITH cells AS (
             |  SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS hod,
             |    COUNT(*) AS obs
             |  FROM events GROUP BY 1, 2),
             |rm AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_n
             |       FROM cells GROUP BY 1),
             |cm AS (SELECT hod, CAST(SUM(obs) AS BIGINT) AS col_n
             |       FROM cells GROUP BY 1),
             |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM cells)
             |SELECT event_type, hod, CAST(obs AS BIGINT) AS obs,
             |  CAST((obs * total * 1000000) // (row_n * col_n) AS BIGINT) AS lift_ppm
             |FROM cells JOIN rm USING (event_type) JOIN cm USING (hod) CROSS JOIN t
             |WHERE abs(CAST((obs * total * 1000000) // (row_n * col_n) AS BIGINT)
             |          - 1000000) > 200000
             |ORDER BY event_type, hod""".stripMargin),
    ),


    // Stationary distribution of the user-journey Markov chain: row-
    // normalized transition mass iterated 4 times in exact integers —
    // π' (v) = Σ_u (π(u)·cnt(u,v)) div rowsum(u), every term a floor on
    // non-negative longs (product before division keeps precision; the
    // π·cnt product bounds the contract at cnt < ~9·10⁶ per edge at
    // M = 10¹² — normalize cnt to ppm first past that). The long-run
    // "where do journeys spend time" ranking; complements q184's
    // per-transition view. Transition matrix is |types|² — model-state
    // sized; the only data-sized pass is the lag window building it.
    QueryDef(
      "q209_stationary_dist",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("u", lag(col("event_type"), 1).over(w))
          .where(col("u").isNotNull)
          .groupBy(col("u"), col("event_type").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val rowsum = trans.groupBy(col("u")).agg(sum(col("cnt")).as("rs"))
        val tm = PinnedCache.pin(trans.join(rowsum, "u"))
        val states = tm.select(col("u").as("node")).distinct()
        val m = 1000000000000L
        val n = states.count()
        var pi = states.withColumn("p", lit(m / n)).localCheckpoint(true)
        for (_ <- 1 to 4) {
          pi = tm.join(pi.select(col("node").as("u"), col("p")), "u")
            .select(col("v").as("node"), expr("(p * cnt) div rs").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("p"))
            .localCheckpoint(true)
        }
        pi.select(col("node").as("event_type"), col("p").as("pi"))
          .orderBy(col("event_type"))
      },
      Some {
        val iters = (1 to 4).map(i =>
          s"""p$i AS (
             |  SELECT c.v AS node, CAST(SUM((p${i - 1}.p * c.cnt) // rs.rs) AS BIGINT) AS p
             |  FROM p${i - 1}
             |  JOIN c ON c.u = p${i - 1}.node
             |  JOIN rs ON rs.u = c.u
             |  GROUP BY c.v)""".stripMargin).mkString(",\n")
        s"""WITH tr AS (
           |  SELECT event_type AS v,
           |    LAG(event_type) OVER (PARTITION BY user_id
           |      ORDER BY epoch_ns(ts), event_id) AS u
           |  FROM events),
           |c AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cnt
           |      FROM tr WHERE u IS NOT NULL GROUP BY u, v),
           |rs AS (SELECT u, CAST(SUM(cnt) AS BIGINT) AS rs FROM c GROUP BY u),
           |st AS (SELECT DISTINCT u AS node FROM c),
           |p0 AS (SELECT node,
           |         1000000000000 // (SELECT COUNT(*) FROM st) AS p FROM st),
           |$iters
           |SELECT node AS event_type, CAST(p AS BIGINT) AS pi
           |FROM p4 ORDER BY event_type""".stripMargin
      },
    ),


    // Dataset card: the one-row-per-source release summary every corpus
    // ships with — volume (docs/tokens/chars), exact-dup burden
    // (non-survivor docs under the q24 keep-min-id rule), language mix
    // (distinct langs + dominant lang share), density (mean tokens ppm).
    // All integer; each piece is an already-proven operator, composed
    // into the single materialized report a consumer reads first.
    QueryDef(
      "q214_dataset_card",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            col("text")))
        val base = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            countDistinct(col("lang")).as("n_langs"))
        // non-survivors: docs sharing a text with a smaller doc_id
        val nonSurv = d.as("a")
          .join(d.select(col("text").as("t2"), col("doc_id").as("id2")).as("b"),
            col("a.text") === col("t2") && col("a.doc_id") > col("id2"), "left_semi")
          .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
        val langTop = d.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("lc"))
          .groupBy(col("source"))
          .agg(min(struct((-col("lc")).as("nc"), col("lang").as("lang"))).as("t"))
          .select(col("source"), col("t.lang").as("top_lang"),
            (-col("t.nc")).as("top_lang_docs"))
        base
          .join(nonSurv, Seq("source"), "left_outer")
          .join(langTop, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
            coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
            col("n_langs"), col("top_lang"),
            expr("(top_lang_docs * 1000000) div n_docs").as("top_lang_ppm"),
            expr("(n_tokens * 1000000) div n_docs").as("mean_tokens_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lang, n_chars,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok, text
             |  FROM documents),
             |base AS (
             |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
             |  FROM d GROUP BY source),
             |ns AS (
             |  SELECT a.source, COUNT(*) AS dup_docs
             |  FROM d a WHERE EXISTS (
             |    SELECT 1 FROM d b WHERE b.text = a.text AND b.doc_id < a.doc_id)
             |  GROUP BY a.source),
             |lt AS (
             |  SELECT source, lang AS top_lang, lc AS top_lang_docs FROM (
             |    SELECT source, lang, COUNT(*) AS lc,
             |      ROW_NUMBER() OVER (PARTITION BY source
             |        ORDER BY COUNT(*) DESC, lang) AS rk
             |    FROM d GROUP BY source, lang)
             |  WHERE rk = 1)
             |SELECT base.source, base.n_docs, base.n_tokens, base.n_chars,
             |  COALESCE(ns.dup_docs, 0) AS dup_docs, base.n_langs,
             |  lt.top_lang,
             |  CAST((lt.top_lang_docs * 1000000) // base.n_docs AS BIGINT)
             |    AS top_lang_ppm,
             |  CAST((base.n_tokens * 1000000) // base.n_docs AS BIGINT)
             |    AS mean_tokens_ppm
             |FROM base
             |LEFT JOIN ns ON ns.source = base.source
             |JOIN lt ON lt.source = base.source
             |ORDER BY base.source""".stripMargin),
    ),


    // Cohort conversion + time-to-convert: per signup-cohort week, how
    // many signups, how many converted (first purchase at-or-after the
    // first signup), the conversion ppm and the exact-rank median
    // time-to-convert — survival analysis's first table. Two user-keyed
    // aggregates + one cohort-keyed rank window over converters only.
    QueryDef(
      "q216_cohort_conversion",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = PinnedCache.pin(tbl(s, dir, "events"))
        val s0 = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
        val conv = s0
          .join(ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("pts")), Seq("user_id"), "left_outer")
          .groupBy(col("user_id"))
          .agg(min(col("s_ts")).as("s_ts"),
            min(when(col("pts") >= col("s_ts"), col("pts"))).as("first_p"))
          .withColumn("cohort_wk", expr("s_ts div 604800000000000"))
          .withColumn("ttc", col("first_p") - col("s_ts"))
        val w = Window.partitionBy(col("cohort_wk")).orderBy(col("ttc"))
        val ranked = conv.where(col("ttc").isNotNull)
          .withColumn("rn", row_number().over(w))
          .withColumn("nc", count(lit(1)).over(Window.partitionBy(col("cohort_wk"))))
        val med = ranked
          .where(col("rn") === ceil(col("nc") / lit(2.0)).cast("int"))
          .select(col("cohort_wk"), col("ttc").as("median_ttc_ns"))
        conv.groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("n_signups"),
            sum(when(col("first_p").isNotNull, 1L).otherwise(0L)).as("n_converted"))
          .join(med, Seq("cohort_wk"), "left_outer")
          .select(col("cohort_wk"), col("n_signups"), col("n_converted"),
            expr("(n_converted * 1000000) div n_signups").as("conversion_ppm"),
            col("median_ttc_ns"))
          .orderBy(col("cohort_wk"))
      },
      Some("""WITH s0 AS (
             |  SELECT user_id, MIN(epoch_ns(ts)) AS s_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |conv AS (
             |  SELECT s0.user_id, s0.s_ts,
             |    MIN(CASE WHEN epoch_ns(e.ts) >= s0.s_ts THEN epoch_ns(e.ts) END)
             |      AS first_p
             |  FROM s0 LEFT JOIN events e
             |    ON e.user_id = s0.user_id AND e.event_type = 'purchase'
             |  GROUP BY 1, 2),
             |c2 AS (SELECT *, s_ts // 604800000000000 AS cohort_wk,
             |         first_p - s_ts AS ttc FROM conv),
             |rk AS (
             |  SELECT cohort_wk, ttc,
             |    ROW_NUMBER() OVER (PARTITION BY cohort_wk ORDER BY ttc) AS rn,
             |    COUNT(*) OVER (PARTITION BY cohort_wk) AS nc
             |  FROM c2 WHERE ttc IS NOT NULL),
             |med AS (
             |  SELECT cohort_wk, ttc AS median_ttc_ns FROM rk
             |  WHERE rn = CAST(ceil(nc / 2.0) AS INTEGER)),
             |agg AS (
             |  SELECT cohort_wk, COUNT(*) AS n_signups,
             |    CAST(SUM(CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_converted
             |  FROM c2 GROUP BY cohort_wk)
             |SELECT agg.cohort_wk, agg.n_signups, agg.n_converted,
             |  CAST((agg.n_converted * 1000000) // agg.n_signups AS BIGINT)
             |    AS conversion_ppm,
             |  med.median_ttc_ns
             |FROM agg LEFT JOIN med USING (cohort_wk)
             |ORDER BY cohort_wk""".stripMargin),
    ),


    // D1/D7/D30 retention: per first-activity cohort DAY, the share of
    // users active exactly N days later (N ∈ {1, 7}; the 30-day span of
    // the corpus makes D30 degenerate, so D14 stands in as the long
    // horizon) — the compact industry triple next to q67's full matrix.
    // One (user, day) distinct rollup + three semi-join probes.
    QueryDef(
      "q219_dn_retention",
      (s, dir) => {
        val ud = PinnedCache.pin(tbl(s, dir, "events")
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .distinct())
        val cohort = PinnedCache.pin(
          ud.groupBy(col("user_id")).agg(min(col("day")).as("c_day")))
        def active(n: Int) = cohort
          .join(ud.select(col("user_id"),
            (col("day") - n).as("c_day")), Seq("user_id", "c_day"), "left_semi")
          .groupBy(col("c_day")).agg(count(lit(1)).as(s"d$n"))
        cohort.groupBy(col("c_day")).agg(count(lit(1)).as("n_users"))
          .join(active(1), Seq("c_day"), "left_outer")
          .join(active(7), Seq("c_day"), "left_outer")
          .join(active(14), Seq("c_day"), "left_outer")
          .select(col("c_day").as("cohort_day"), col("n_users"),
            coalesce(col("d1"), lit(0L)).as("d1"),
            coalesce(col("d7"), lit(0L)).as("d7"),
            coalesce(col("d14"), lit(0L)).as("d14"),
            expr("(coalesce(d1, 0L) * 1000000) div n_users").as("d1_ppm"),
            expr("(coalesce(d7, 0L) * 1000000) div n_users").as("d7_ppm"),
            expr("(coalesce(d14, 0L) * 1000000) div n_users").as("d14_ppm"))
          .orderBy(col("cohort_day"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events),
             |c AS (SELECT user_id, MIN(day) AS c_day FROM ud GROUP BY user_id),
             |a1 AS (SELECT c.c_day, COUNT(*) AS d1 FROM c
             |       WHERE EXISTS (SELECT 1 FROM ud WHERE ud.user_id = c.user_id
             |                     AND ud.day = c.c_day + 1) GROUP BY 1),
             |a7 AS (SELECT c.c_day, COUNT(*) AS d7 FROM c
             |       WHERE EXISTS (SELECT 1 FROM ud WHERE ud.user_id = c.user_id
             |                     AND ud.day = c.c_day + 7) GROUP BY 1),
             |a14 AS (SELECT c.c_day, COUNT(*) AS d14 FROM c
             |        WHERE EXISTS (SELECT 1 FROM ud WHERE ud.user_id = c.user_id
             |                      AND ud.day = c.c_day + 14) GROUP BY 1),
             |n AS (SELECT c_day, COUNT(*) AS n_users FROM c GROUP BY 1)
             |SELECT n.c_day AS cohort_day, n.n_users,
             |  COALESCE(a1.d1, 0) AS d1, COALESCE(a7.d7, 0) AS d7,
             |  COALESCE(a14.d14, 0) AS d14,
             |  CAST((COALESCE(a1.d1, 0) * 1000000) // n.n_users AS BIGINT) AS d1_ppm,
             |  CAST((COALESCE(a7.d7, 0) * 1000000) // n.n_users AS BIGINT) AS d7_ppm,
             |  CAST((COALESCE(a14.d14, 0) * 1000000) // n.n_users AS BIGINT) AS d14_ppm
             |FROM n
             |LEFT JOIN a1 USING (c_day) LEFT JOIN a14 USING (c_day)
             |LEFT JOIN a7 USING (c_day)
             |ORDER BY cohort_day""".stripMargin),
    ),

    // The explicit hot-key SALTED JOIN as a driver-gated query: the skew
    // audit (q144's operator) finds the hot event types (each holds
    // ~20% of all rows — far past the 10% threshold), its hot-key list
    // feeds Skew.saltedSkewJoin (fact side scatters hot keys over 8
    // sub-keys, only hot dim rows replicate), and the oracle is the
    // PLAIN join — a pass proves the rewrite is row-identical, the
    // SkewRehearsalSpec listener tests prove it balances. Hot keys are
    // metadata-sized by the audit's threshold definition, so the
    // driver-side collect is the model-state pattern.
    QueryDef(
      "q254_salted_join",
      (s, dir) => {
        val ev = tbl(s, dir, "events").select(col("event_type"), col("user_id"))
        val dim = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"))
        val hot = Skew.skewAudit(ev, "event_type",
            targetPerTask = 4096L, thresholdPpm = 100000L)
          .select(col("key")).collect().map(_.getString(0)).toSeq.sorted
        Skew.saltedSkewJoin(ev, dim, "event_type", hot, salt = 8)
          .groupBy(col("event_type"), col("n_users"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (
             |  SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users
             |  FROM events GROUP BY 1)
             |SELECT e.event_type, d.n_users, COUNT(*)::BIGINT AS n_events
             |FROM events e JOIN d USING (event_type)
             |GROUP BY 1, 2 ORDER BY event_type""".stripMargin),
    ),

    // RFM customer segmentation: per-customer recency/frequency/monetary
    // terciles (NTILE(3) with the unique custkey tiebreaker — identical
    // floor-distribution semantics in both engines), rolled up to the 27
    // segment cells. The partition-less tercile windows run over the
    // CUSTOMER rollup, not the order fact (the q174 rule: global windows
    // only over rollup-cardinality frames); money sums in cents
    // (round-then-cast on BOTH sides — Spark CAST truncates, DuckDB
    // rounds).
    QueryDef(
      "q255_rfm_segments",
      (s, dir) => {
        val per = tbl(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(expr("unix_micros(cast(o_orderdate as timestamp))")).as("rec"),
            count(lit(1)).as("freq"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("mon_c"))
        val t = (m: String) => ntile(3)
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col(m), col("o_custkey"))).cast("long")
        per
          .withColumn("r_t", t("rec"))
          .withColumn("f_t", t("freq"))
          .withColumn("m_t", t("mon_c"))
          .groupBy(col("r_t"), col("f_t"), col("m_t"))
          .agg(count(lit(1)).as("n_customers"), sum(col("mon_c")).as("rev_c"))
          .orderBy(col("r_t"), col("f_t"), col("m_t"))
      },
      Some("""WITH per AS (
             |  SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS rec,
             |    COUNT(*)::BIGINT AS freq,
             |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT o_custkey, mon_c,
             |    CAST(NTILE(3) OVER (ORDER BY rec, o_custkey) AS BIGINT) AS r_t,
             |    CAST(NTILE(3) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f_t,
             |    CAST(NTILE(3) OVER (ORDER BY mon_c, o_custkey) AS BIGINT) AS m_t
             |  FROM per)
             |SELECT r_t, f_t, m_t, COUNT(*)::BIGINT AS n_customers,
             |  CAST(SUM(mon_c) AS BIGINT) AS rev_c
             |FROM t GROUP BY 1, 2, 3 ORDER BY r_t, f_t, m_t""".stripMargin),
    ),

    // U-shaped (position-based) MULTI-touch attribution — the standard
    // complement to q205's last-touch: each user's first purchase is the
    // conversion; the non-purchase events strictly before it (total
    // (ts, event_id) order) are the touch path; credit in integer ppm:
    // a single touch takes 1e6, otherwise first and last take 400000
    // each and the middles split 200000 by floor division (the
    // remainder is deliberately unassigned — exact-integer convention).
    // Per-user windows only; the rollup is one partial agg.
    QueryDef(
      "q257_multitouch_attribution",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val conv = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"))).as("c"))
          .select(col("user_id"), col("c.ts").as("c_ts"), col("c.event_id").as("c_id"))
        val touches = ev.join(conv, "user_id")
          .where(col("event_type") =!= "purchase" &&
            (col("ts") < col("c_ts") ||
              (col("ts") === col("c_ts") && col("event_id") < col("c_id"))))
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        touches
          .withColumn("rk", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll).cast("long"))
          .withColumn("credit_ppm",
            when(col("n") === 1, 1000000L)
              .when(col("rk") === 1 || col("rk") === col("n"), 400000L)
              .otherwise(expr("200000L div (n - 2)")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_touches"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("credit_ppm")).as("credit_ppm_sum"))
          .orderBy(col("event_type"))
      },
      Some("""WITH c2 AS (
             |  SELECT user_id, ts AS c_ts, event_id AS c_id FROM (
             |    SELECT user_id, epoch_ns(ts) AS ts, event_id,
             |      ROW_NUMBER() OVER (PARTITION BY user_id
             |        ORDER BY epoch_ns(ts), event_id) AS rn
             |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
             |touch AS (
             |  SELECT e.user_id, e.event_type, epoch_ns(e.ts) AS ts, e.event_id
             |  FROM events e JOIN c2 USING (user_id)
             |  WHERE e.event_type <> 'purchase'
             |    AND (epoch_ns(e.ts) < c2.c_ts
             |         OR (epoch_ns(e.ts) = c2.c_ts AND e.event_id < c2.c_id))),
             |r AS (
             |  SELECT user_id, event_type,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
             |    COUNT(*) OVER (PARTITION BY user_id) AS n
             |  FROM touch)
             |SELECT event_type, COUNT(*)::BIGINT AS n_touches,
             |  COUNT(DISTINCT user_id)::BIGINT AS n_users,
             |  CAST(SUM(CASE WHEN n = 1 THEN 1000000
             |                WHEN rk = 1 OR rk = n THEN 400000
             |                ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_ppm_sum
             |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin),
    ),

    // FRESHNESS-decayed volume: per event type, the half-life-weighted
    // event mass (weight halves per week of age from the stream's max
    // event time — exact integer: 1e6 div 2^age_weeks, zero past 20
    // weeks) next to the raw count. The "how much of this source is
    // recent" signal recency-sensitive mixtures weigh by; the decay is
    // shift arithmetic so both engines floor identically. One global
    // 1-row max broadcast + one partial-agg rollup.
    QueryDef(
      "q267_freshness_decay",
      (s, dir) => {
        val ev = tbl(s, dir, "events").select(col("event_type"), col("ts"))
        val mx = ev.agg(max(col("ts")).as("max_ts"))
        ev.crossJoin(broadcast(mx))
          .withColumn("age", expr("(max_ts - ts) div 604800000000000"))
          .withColumn("w_ppm",
            expr("case when age <= 20 then 1000000 div shiftleft(1L, int(age)) " +
              "else 0L end"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("w_ppm")).as("w_sum"),
            expr("sum(w_ppm) div count(1)").as("w_avg_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (SELECT MAX(epoch_ns(ts)) AS max_ts FROM events),
             |w AS (
             |  SELECT event_type,
             |    (m.max_ts - epoch_ns(ts)) // 604800000000000 AS age
             |  FROM events CROSS JOIN m),
             |w2 AS (
             |  SELECT event_type,
             |    CASE WHEN age <= 20 THEN 1000000 // (1::BIGINT << CAST(age AS INTEGER))
             |         ELSE 0 END AS w_ppm
             |  FROM w)
             |SELECT event_type, COUNT(*)::BIGINT AS n_events,
             |  CAST(SUM(w_ppm) AS BIGINT) AS w_sum,
             |  CAST(SUM(w_ppm) // COUNT(*) AS BIGINT) AS w_avg_ppm
             |FROM w2 GROUP BY 1 ORDER BY event_type""".stripMargin),
    ),

    // Referential-CONFORMANCE audit: orphan foreign keys across the
    // star — the data-quality gate every warehouse load runs before
    // anything downstream trusts a join (an orphan silently drops rows
    // in inner joins and fabricates nulls in outer ones). One
    // broadcast-anti-join per edge (key sets are dimension-sized),
    // rolled into a (relation, fk) violation table.
    QueryDef(
      "q270_fk_conformance",
      (s, dir) => {
        def audit(rel: String, fk: String, fact: org.apache.spark.sql.DataFrame,
            factKey: String, dimKeys: org.apache.spark.sql.DataFrame) =
          fact.select(col(factKey).as("k"))
            .join(broadcast(dimKeys.toDF("k")), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_orphan_rows"),
              countDistinct(col("k")).as("n_orphan_keys"))
            .select(lit(rel).as("relation"), lit(fk).as("fk"),
              col("n_orphan_rows"), col("n_orphan_keys"))
        val orders = tbl(s, dir, "orders")
        val cust = tbl(s, dir, "customer")
        val li = tbl(s, dir, "lineitem")
        val nat = tbl(s, dir, "nation")
        audit("lineitem", "l_orderkey", li, "l_orderkey",
            orders.select(col("o_orderkey")))
          .unionByName(audit("orders", "o_custkey", orders, "o_custkey",
            cust.select(col("c_custkey"))))
          .unionByName(audit("customer", "c_nationkey", cust, "c_nationkey",
            nat.select(col("n_nationkey"))))
          .unionByName(audit("events", "user_id", tbl(s, dir, "events"),
            "user_id", cust.select(col("c_custkey"))))
          .orderBy(col("relation"), col("fk"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'lineitem' AS relation, 'l_orderkey' AS fk,
             |    COUNT(*)::BIGINT AS n_orphan_rows,
             |    COUNT(DISTINCT l_orderkey)::BIGINT AS n_orphan_keys
             |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
             |  UNION ALL
             |  SELECT 'orders', 'o_custkey', COUNT(*)::BIGINT,
             |    COUNT(DISTINCT o_custkey)::BIGINT
             |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
             |  UNION ALL
             |  SELECT 'customer', 'c_nationkey', COUNT(*)::BIGINT,
             |    COUNT(DISTINCT c_nationkey)::BIGINT
             |  FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
             |  UNION ALL
             |  SELECT 'events', 'user_id', COUNT(*)::BIGINT,
             |    COUNT(DISTINCT user_id)::BIGINT
             |  FROM events WHERE user_id NOT IN (SELECT c_custkey FROM customer))
             |ORDER BY relation, fk""".stripMargin),
    ),

    // Spend MOBILITY matrix: customer spend terciles in the first vs
    // second half of the order window (midpoint = integer mean of the
    // min/max order epoch — one 1-row broadcast), crossed into the 3×3
    // transition matrix over customers active in BOTH halves. The
    // diagonal mass is revenue stickiness; heavy off-diagonals mean
    // churn-and-replace. NTILE with the custkey tiebreaker (bit-equal
    // floor distribution in both engines); cents-exact spend.
    QueryDef(
      "q273_spend_mobility",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = tbl(s, dir, "orders").select(col("o_custkey"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("ts"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val mid = o.agg(expr("(min(ts) + max(ts)) div 2").as("mid"))
        val spend = o.crossJoin(broadcast(mid))
          .withColumn("half", when(col("ts") <= col("mid"), 1L).otherwise(2L))
          .groupBy(col("o_custkey"), col("half")).agg(sum(col("cents")).as("sp"))
        val t = spend.withColumn("t", ntile(3).over(
          Window.partitionBy(col("half")).orderBy(col("sp"), col("o_custkey")))
          .cast("long"))
        t.where(col("half") === 1L)
          .select(col("o_custkey"), col("t").as("t_h1"))
          .join(t.where(col("half") === 2L)
            .select(col("o_custkey"), col("t").as("t_h2")), "o_custkey")
          .groupBy(col("t_h1"), col("t_h2"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("t_h1"), col("t_h2"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, epoch_us(o_orderdate) AS ts,
             |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |m AS (SELECT (MIN(ts) + MAX(ts)) // 2 AS mid FROM o),
             |sp AS (
             |  SELECT o_custkey,
             |    CASE WHEN ts <= m.mid THEN 1 ELSE 2 END AS half,
             |    SUM(cents) AS spv
             |  FROM o CROSS JOIN m GROUP BY 1, 2),
             |t AS (
             |  SELECT o_custkey, half,
             |    CAST(NTILE(3) OVER (PARTITION BY half ORDER BY spv, o_custkey)
             |         AS BIGINT) AS t
             |  FROM sp)
             |SELECT a.t AS t_h1, b.t AS t_h2, COUNT(*)::BIGINT AS n_customers
             |FROM t a JOIN t b ON a.o_custkey = b.o_custkey
             |  AND a.half = 1 AND b.half = 2
             |GROUP BY 1, 2 ORDER BY t_h1, t_h2""".stripMargin),
    ),
    // Markov removal-effect attribution — the chain-based complement to
    // last-touch (q184-style) and U-shaped (q257): journeys truncated at
    // first purchase become a (state -> state) transition-count matrix
    // with start/conv/null absorption; per-channel credit = the drop in
    // absorbing conversion probability when transitions INTO that channel
    // redirect to null (denominators stay the base out-counts — the
    // standard removal semantics). The absorption fixed point runs as 20
    // value-iteration rounds in exact ppm integers (truncating div each
    // round — both engines quantize identically, so the oracle's
    // recursive CTE replays it bit-for-bit). Corpus scale touches ONLY
    // the one distributed rollup that builds the transition counts; the
    // matrix itself is MODEL STATE (≤ (|types|+1)² ≈ 49 rows, bounded by
    // the type vocabulary, not the data), so the fixed point runs
    // driver-side in Long arithmetic — the greedyCover/limit(1)
    // precedent; pushing 100 constant-sized jobs through the scheduler
    // measured 7 s of pure overhead at any sf.
    QueryDef(
      "q293_markov_attribution",
      (s, dir) => {
        val wU = Window.partitionBy("user_id")
        val wSeq = wU.orderBy(col("ts"), col("event_id"))
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("fp_ts",
            min(when(col("event_type") === "purchase", col("ts"))).over(wU))
          .where(col("fp_ts").isNull || col("ts") <= col("fp_ts"))
        val seq0 = ev.select(col("user_id"), col("event_type").as("cur"),
          lead(col("event_type"), 1).over(wSeq).as("nxt"),
          row_number().over(wSeq).as("rn"))
        val trans: Array[(String, String, Long)] =
          seq0.where(col("rn") === 1)
            .select(lit("start").as("s"),
              when(col("cur") === "purchase", "conv").otherwise(col("cur")).as("d"))
            .unionByName(seq0.where(col("cur") =!= "purchase")
              .select(col("cur").as("s"),
                when(col("nxt") === "purchase", "conv")
                  .when(col("nxt").isNull, "null").otherwise(col("nxt")).as("d")))
            .groupBy("s", "d").agg(count(lit(1)).as("cnt"))
            .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val outc = trans.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._3).sum }
        val scenarios = Seq("base", "no_view", "no_click", "no_signup", "no_error")
        val states = (trans.map(_._1).toSet ++ Set("conv", "null")).toSeq.sorted
        val results = scenarios.map { sc =>
          // removal: the channel's own rows drop; transitions INTO it -> null
          val st = trans.filter { case (src, _, _) => sc != s"no_$src" }
            .map { case (src, d, cnt) =>
              (src, if (sc == s"no_$d") "null" else d, cnt) }
            .groupBy(t => (t._1, t._2))
            .map { case ((src, d), xs) => (src, d, xs.map(_._3).sum) }.toSeq
          var v: Map[String, Long] =
            states.map(x => x -> (if (x == "conv") 1000000L else 0L)).toMap
          for (_ <- 1 to 20) {
            val upd = st.groupBy(_._1).map { case (src, xs) =>
              // BigInt products: cnt·vp can reach 10^18 at trillion-event
              // corpora; the quotient is back under 10^6
              src -> (xs.map { case (_, d, cnt) => BigInt(cnt) * v(d) }.sum /
                outc(src)).toLong
            }
            v = states.map(x => x -> (x match {
              case "conv" => 1000000L
              case "null" => 0L
              case other  => upd.getOrElse(other, 0L)
            })).toMap
          }
          (sc, v("start"))
        }
        val pb = results.find(_._1 == "base").get._2
        import s.implicits._
        results.map { case (sc, vp) =>
          (sc, vp, pb,
            if (sc == "base") Some(0L)
            else if (pb == 0L) None // mirrors the oracle's NULLIF
            else Some((BigInt(pb - vp) * 1000000 / pb).toLong))
        }.toDF("scenario", "p_conv_ppm", "base_ppm", "removal_effect_ppm")
          .orderBy("scenario")
      },
      Some("""WITH RECURSIVE j AS (
             |  SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
             |    MIN(CASE WHEN event_type='purchase' THEN epoch_ns(ts) END)
             |      OVER (PARTITION BY user_id) AS fp_ts
             |  FROM events),
             |e AS (
             |  SELECT user_id, event_type, ts, event_id FROM j
             |  WHERE fp_ts IS NULL OR ts <= fp_ts),
             |seq AS (
             |  SELECT user_id, event_type AS cur, ts, event_id,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM e),
             |trans0 AS (
             |  SELECT 'start' AS s, CASE WHEN cur='purchase' THEN 'conv' ELSE cur END AS d, COUNT(*) AS cnt
             |  FROM seq WHERE rn = 1 GROUP BY 1, 2
             |  UNION ALL
             |  SELECT cur AS s,
             |    CASE WHEN nxt = 'purchase' THEN 'conv' WHEN nxt IS NULL THEN 'null' ELSE nxt END AS d,
             |    COUNT(*) AS cnt
             |  FROM seq WHERE cur <> 'purchase' GROUP BY 1, 2),
             |trans AS (SELECT s, d, CAST(SUM(cnt) AS BIGINT) AS cnt FROM trans0 GROUP BY s, d),
             |outd AS (SELECT s, CAST(SUM(cnt) AS BIGINT) AS outc FROM trans GROUP BY s),
             |scen(scenario) AS (SELECT * FROM (VALUES ('base'), ('no_view'), ('no_click'), ('no_signup'), ('no_error'))),
             |strans AS (
             |  SELECT sc.scenario, t.s,
             |    CASE WHEN sc.scenario = 'no_' || t.d THEN 'null' ELSE t.d END AS d,
             |    t.cnt
             |  FROM trans t CROSS JOIN scen sc
             |  WHERE NOT (sc.scenario = 'no_' || t.s)),
             |strans2 AS (SELECT scenario, s, d, CAST(SUM(cnt) AS BIGINT) AS cnt FROM strans GROUP BY 1,2,3),
             |states AS (SELECT DISTINCT s FROM trans UNION SELECT 'conv' UNION SELECT 'null'),
             |v AS (
             |    SELECT sc.scenario, st.s AS state,
             |      CAST(CASE WHEN st.s = 'conv' THEN 1000000 ELSE 0 END AS BIGINT) AS vp, 0 AS t
             |    FROM states st CROSS JOIN scen sc
             |    UNION ALL
             |    SELECT v.scenario, v.state,
             |      CASE WHEN v.state = 'conv' THEN 1000000
             |           WHEN v.state = 'null' THEN 0
             |           ELSE COALESCE((
             |             SELECT CAST(SUM(t2.cnt * vv.vp) // MIN(o.outc) AS BIGINT)
             |             FROM strans2 t2
             |             JOIN v vv ON vv.scenario = v.scenario AND vv.state = t2.d AND vv.t = v.t
             |             JOIN outd o ON o.s = t2.s
             |             WHERE t2.scenario = v.scenario AND t2.s = v.state), 0)
             |      END AS vp,
             |      v.t + 1
             |    FROM v WHERE v.t < 20),
             |fin AS (SELECT scenario, vp FROM v WHERE t = 20 AND state = 'start'),
             |base AS (SELECT vp AS pb FROM fin WHERE scenario = 'base')
             |SELECT f.scenario, f.vp AS p_conv_ppm, base.pb AS base_ppm,
             |  CASE WHEN f.scenario = 'base' THEN 0
             |       ELSE (base.pb - f.vp) * 1000000 // NULLIF(base.pb, 0) END AS removal_effect_ppm
             |FROM fin f CROSS JOIN base ORDER BY f.scenario""".stripMargin),
    ),
    // Exact Shapley-value revenue attribution over touched-channel
    // coalitions: each user's pre-conversion touchset (4 non-purchase
    // channels -> a 4-bit mask) carries their purchase revenue as the
    // coalition worth; with the standard cumulative characteristic
    // function v(S) = SUM w(T) over T SUBSETOF S, the Shapley value
    // collapses to the closed form phi_c = SUM over T containing c of
    // w(T)/|T| — ONE pass over the 15 nonempty masks, no permutation
    // enumeration. Exactness: common denominator 12 = lcm(1..4), so
    // phi*12 is an integer (emitted as phi_x12_cents; efficiency
    // SUM phi = attributed revenue holds by construction). Corpus scale
    // touches only the per-user rollup; everything after is a 15-row
    // frame.
    QueryDef(
      "q294_shapley_attribution",
      (s, dir) => {
        val wU = Window.partitionBy("user_id")
        val u = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("value"))
          .withColumn("fp_ts",
            min(when(col("event_type") === "purchase", col("ts"))).over(wU))
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("rev"),
            sum_distinct(
              when(col("event_type") === "view" &&
                (col("fp_ts").isNull || col("ts") < col("fp_ts")), 1L)
              .when(col("event_type") === "click" &&
                (col("fp_ts").isNull || col("ts") < col("fp_ts")), 2L)
              .when(col("event_type") === "signup" &&
                (col("fp_ts").isNull || col("ts") < col("fp_ts")), 4L)
              .when(col("event_type") === "error" &&
                (col("fp_ts").isNull || col("ts") < col("fp_ts")), 8L)
              .otherwise(0L)).as("mask"))
        val sized = u.where(col("mask") > 0)
          .groupBy("mask").agg(sum("rev").as("w"))
          .withColumn("sz", expr(
            "cast((mask % 2) + (mask div 2) % 2 + (mask div 4) % 2 + (mask div 8) % 2 as bigint)"))
        val ch = s.range(1).select(explode(typedLit(Seq(
          ("view", 1L), ("click", 2L), ("signup", 4L), ("error", 8L)))).as("c"))
          .select(col("c._1").as("channel"), col("c._2").as("bit"))
        val phi = sized.join(ch, expr("(mask div bit) % 2 = 1"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_touchsets"),
            sum(col("w") * expr("12 div sz")).as("phi_x12_cents"))
        val tot = phi.agg(sum("phi_x12_cents").as("t"))
        phi.crossJoin(broadcast(tot))
          .select(col("channel"), col("n_touchsets"), col("phi_x12_cents"),
            expr("phi_x12_cents * 1000000 div t").as("share_ppm"))
          .orderBy("channel")
      },
      Some("""WITH j AS (
             |  SELECT user_id, event_type, epoch_ns(ts) AS ts, value,
             |    MIN(CASE WHEN event_type='purchase' THEN epoch_ns(ts) END)
             |      OVER (PARTITION BY user_id) AS fp_ts
             |  FROM events),
             |u AS (
             |  SELECT user_id,
             |    CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev,
             |    CAST(SUM(DISTINCT CASE
             |      WHEN event_type='view'   AND (fp_ts IS NULL OR ts < fp_ts) THEN 1
             |      WHEN event_type='click'  AND (fp_ts IS NULL OR ts < fp_ts) THEN 2
             |      WHEN event_type='signup' AND (fp_ts IS NULL OR ts < fp_ts) THEN 4
             |      WHEN event_type='error'  AND (fp_ts IS NULL OR ts < fp_ts) THEN 8
             |      ELSE 0 END) AS BIGINT) AS mask
             |  FROM j GROUP BY user_id),
             |vs AS (SELECT mask, CAST(SUM(rev) AS BIGINT) AS w FROM u WHERE mask > 0 GROUP BY mask),
             |sized AS (SELECT mask, w,
             |    CAST((mask % 2) + (mask // 2) % 2 + (mask // 4) % 2 + (mask // 8) % 2 AS BIGINT) AS sz
             |  FROM vs),
             |ch(channel, bit) AS (SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4), ('error', 8))),
             |phi AS (
             |  SELECT ch.channel, COUNT(*) AS n_touchsets,
             |    CAST(SUM(sized.w * (12 // sized.sz)) AS BIGINT) AS phi_x12_cents
             |  FROM sized JOIN ch ON (sized.mask // ch.bit) % 2 = 1
             |  GROUP BY ch.channel),
             |tot AS (SELECT CAST(SUM(phi_x12_cents) AS BIGINT) AS t FROM phi)
             |SELECT channel, n_touchsets, phi_x12_cents,
             |  phi_x12_cents * 1000000 // tot.t AS share_ppm
             |FROM phi CROSS JOIN tot ORDER BY channel""".stripMargin),
    ),
  )
}
