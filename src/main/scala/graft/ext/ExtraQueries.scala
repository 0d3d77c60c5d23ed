package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Round-6 tail of the query surface (q187+): graph traversal /
  * seeded authority over the host link graph, relational pivot, greedy
  * corpus selection, seasonal baselines, mutual-kNN, and cluster-quality
  * audits — each with its independent DuckDB oracle derivation
  * (`/root/reference` has no counterpart for these; they are the
  * north-star LLM-pipeline tier of SURVEY.md §2.4). */
object ExtraQueries {

  /** Symmetrized host-level link graph (q171/q172's derivation): the
    * deterministic href fixture rendered per doc, REAL regex link
    * extraction, src host from the doc's canonicalized fixture URL, dst
    * host from the href — distinct (src, dst) edges plus their mirror.
    * Map-only until the distinct; node ids are strings (group/join keys
    * never need dense ints). */
  private def hostLinkGraph(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val links = Web.extractLinks(
      Web.syntheticHtmlLinks(d, "doc_id", "text"), "doc_id", "html")
    val srcH = d.select(col("doc_id"),
      Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
        .as("src"))
    val e = links.join(srcH, "doc_id")
      .select(col("src"), Web.hostOf(col("url")).as("dst")).distinct()
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** DuckDB replica of [[hostLinkGraph]]: CTE chain ending in `sym`
    * (src, dst) and `deg` (src, deg) — the q172 derivation, shared by the
    * graph-tier oracles below. */
  private val hostGraphSql: String =
    "WITH u AS (SELECT doc_id, " + Web.fixtureUrlSql +
      " AS url FROM documents),\n" + Web.canonicalizeSql + ",\n" +
      """t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)||':'||CAST(j AS VARCHAR)
        |      ||':'||CAST(k AS VARCHAR)||':href'),1,15)) AS BIGINT) AS h2
        |  FROM t,
        |    unnest(generate_series(0, (len(toks)+3)//4 - 1)) uj(j),
        |    unnest(generate_series(0, LEAST(4, len(toks) - j*4) - 1)) uk(k)
        |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)||':'||CAST(j AS VARCHAR)
        |    ||':'||CAST(k AS VARCHAR)),1,15)) AS BIGINT) % 4 = 0),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT c.host AS src,
        |    'h' || CAST(x.h2 % 20 AS VARCHAR) || '.example.org' AS dst
        |  FROM x JOIN c ON c.doc_id = x.doc_id),
        |sym AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src)""".stripMargin

  /** Seed hosts for the traversal/trust queries: two synthetic hub hosts
    * from the href fixture's 20-host target space. */
  private val SeedHosts = Seq("h0.example.org", "h1.example.org")
  private val seedValuesSql: String =
    "(VALUES " + SeedHosts.map(h => s"('$h')").mkString(", ") + ") v(node)"

  def queries: Seq[QueryDef] = Seq(

    // Crawl-frontier distance: exact min-hop BFS distance of every host
    // from a trusted seed set over the symmetrized link graph, 4 rounds
    // (unreached hosts absent). Delta-frontier Pregel expansion — per
    // round one frontier⋈edges join + one node-keyed min, O(m) total.
    QueryDef(
      "q187_bfs_frontier",
      (s, dir) => {
        import s.implicits._
        Graphs.bfsDistances(hostLinkGraph(s, dir),
            SeedHosts.toDF("node"), rounds = 4)
          .select(col("node").as("host"), col("d").as("dist"))
          .orderBy(col("host"))
      },
      Some {
        val rounds = (1 to 4).map(i =>
          s"""d$i AS MATERIALIZED (
             |  SELECT node, MIN(d) AS d FROM (
             |    SELECT node, d FROM d${i - 1}
             |    UNION ALL
             |    SELECT sym.dst, d${i - 1}.d + 1
             |    FROM d${i - 1} JOIN sym ON d${i - 1}.node = sym.src) z
             |  GROUP BY node)""".stripMargin).mkString(",\n")
        hostGraphSql +
          s""",
             |d0 AS (SELECT node, 0 AS d FROM $seedValuesSql),
             |$rounds
             |SELECT node AS host, CAST(d AS BIGINT) AS dist
             |FROM d4 ORDER BY host""".stripMargin
      },
    ),

    // Seeded authority (TrustRank shape): personalized integer PageRank
    // with the teleport vector on the seed hosts — authority relative to
    // a trusted core, the crawl-curation counterpart of q172's global
    // authority. Bit-exact integer recurrence, 4 iterations; zero-rank
    // tail dropped (state ∝ reached set).
    QueryDef(
      "q188_trust_rank",
      (s, dir) => {
        import s.implicits._
        Graphs.personalizedPageRank(hostLinkGraph(s, dir),
            SeedHosts.toDF("node"), iters = 4)
          .select(col("node").as("host"), col("r").as("rank"))
          .orderBy(col("host"))
      },
      Some {
        val m = 1000000000000L
        val iters = (1 to 4).map(i =>
          s"""p$i AS MATERIALIZED (
             |  SELECT node, SUM(r) AS r FROM (
             |    SELECT sym.dst AS node,
             |      (85 * SUM(p${i - 1}.r // deg.deg)) // 100 AS r
             |    FROM p${i - 1}
             |    JOIN sym ON p${i - 1}.node = sym.src
             |    JOIN deg ON sym.src = deg.src
             |    GROUP BY sym.dst
             |    UNION ALL
             |    SELECT node, (SELECT tel FROM cst) FROM sv) z
             |  GROUP BY node HAVING SUM(r) > 0)""".stripMargin).mkString(",\n")
        hostGraphSql +
          s""",
             |sv AS (SELECT node FROM $seedValuesSql),
             |cst AS (SELECT (15 * ($m // ${SeedHosts.size})) // 100 AS tel),
             |p0 AS (SELECT node, $m // ${SeedHosts.size} AS r FROM sv),
             |$iters
             |SELECT node AS host, CAST(r AS BIGINT) AS rank
             |FROM p4 ORDER BY host""".stripMargin
      },
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

    // Mutual nearest-neighbor pairs: (a, b) where each is the other's
    // exact cosine top-1 — the high-precision pairing used for alignment
    // / translation mining (reciprocal best match kills asymmetric hub
    // matches that plain top-1 keeps). candidates = "brute" is the
    // reference semantics the oracle replicates; the ivf/multiprobe scale
    // paths are the SAME executed operator (Similarity.mutualKnn via the
    // topKCandidates seam), pinned equal to brute at the gate sfs and
    // recall-gated at sf0.1 by AnnSeamSpec.
    QueryDef(
      "q192_mutual_knn",
      (s, dir) => Similarity.mutualKnn(tbl(s, dir, "embeddings"),
          "embedding", "vec_id", candidates = "brute")
        .orderBy(col("a_id")),
      Some("""WITH n AS (
             |  SELECT vec_id, embedding,
             |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
             |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
             |  FROM embeddings),
             |t1 AS (
             |  SELECT qid, nid, sim FROM (
             |    SELECT q.vec_id AS qid, c.vec_id AS nid,
             |      list_sum([CAST(q.embedding[i] AS DOUBLE)*c.embedding[i]
             |                FOR i IN generate_series(1,len(q.embedding))])/(q.nrm*c.nrm) AS sim,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_sum([CAST(q.embedding[i] AS DOUBLE)*c.embedding[i]
             |                  FOR i IN generate_series(1,len(q.embedding))])/(q.nrm*c.nrm) DESC,
             |        c.vec_id) AS rk
             |    FROM n q JOIN n c ON q.vec_id != c.vec_id)
             |  WHERE rk = 1)
             |SELECT x.qid AS a_id, x.nid AS b_id, x.sim AS cos_sim
             |FROM t1 x JOIN t1 y ON x.qid = y.nid AND x.nid = y.qid AND x.qid < x.nid
             |ORDER BY a_id""".stripMargin),
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

    // Dup-cluster cohesion audit: for each near-dup connected component,
    // how many of its possible member pairs actually cleared the Jaccard
    // threshold (edge coverage), and how weak the weakest edge is. Low
    // coverage / low min flags CHAIN-shaped clusters built by transitive
    // merges — the known failure mode of CC over pairwise near-dup (the
    // q139 lcc audit's set-similarity counterpart). Reuses the
    // oracle-proven q26 pairs + q44 components; per-cluster rollups only.
    QueryDef(
      "q195_cluster_cohesion",
      (s, dir) => {
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5))
        val cc = Dedup.connectedComponents(pairs)
        val sizes = cc.groupBy(col("root")).agg(count(lit(1)).as("size"))
        val edges = pairs
          .join(cc.select(col("id").as("a_id"), col("root")), "a_id")
          .groupBy(col("root"))
          .agg(count(lit(1)).as("n_edges"),
            floor(min(col("jaccard")) * 1000000).cast("long").as("min_j_ppm"))
        sizes.join(edges, "root")
          .select(col("root").as("root_id"), col("size"), col("n_edges"),
            expr("size * (size - 1) div 2").as("n_possible"),
            expr("(n_edges * 1000000) div (size * (size - 1) div 2)")
              .as("coverage_ppm"),
            col("min_j_ppm"))
          .orderBy(col("root_id"))
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS j
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |sizes AS (SELECT root, COUNT(*) AS size FROM labels GROUP BY root),
             |ed AS (
             |  SELECT l.root, COUNT(*) AS n_edges,
             |    CAST(floor(MIN(p.j) * 1000000) AS BIGINT) AS min_j_ppm
             |  FROM pairs p JOIN labels l ON l.id = p.a_id GROUP BY l.root)
             |SELECT root AS root_id, CAST(size AS BIGINT) AS size,
             |  n_edges, size * (size - 1) // 2 AS n_possible,
             |  (n_edges * 1000000) // (size * (size - 1) // 2) AS coverage_ppm,
             |  min_j_ppm
             |FROM sizes JOIN ed USING (root) ORDER BY root_id""".stripMargin),
    ),

    // Inter-label centroid distance matrix over int8-QUANTIZED embeddings:
    // label-pair separation audit on exact integers (quantized sums are
    // order-independent, unlike float centroids — the trick that makes a
    // centroid geometry oracle-checkable at all). dist_num =
    // Σ_d (s_a·c_b − s_b·c_a)² = (c_a·c_b)²·L2²(mean_a, mean_b); the
    // normalized double is one division at the end. Cross-multiplied
    // products stay < 2^63 while 127·n_a·n_b < ~3·10⁹ (n per label
    // ≲ 150k; beyond, decimal(38) — the q110 convention). Model-state
    // shape: d-per-label sums, labels² pairs — dimension-bounded.
    QueryDef(
      "q196_centroid_matrix",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val q = emb.select(col("label").cast("long").as("label"),
          Quantization.quantizeInt8(col("embedding"),
            Quantization.int8Scale(col("embedding"))).as("q"))
        val ex = q.select(col("label"), posexplode(col("q")))
        val sums = PinnedCache.pin(ex.groupBy(col("label"), col("pos"))
          .agg(sum(col("col")).as("s")))
        val cnt = PinnedCache.pin(
          q.groupBy(col("label")).agg(count(lit(1)).as("c")))
        sums.as("a")
          .join(sums.as("b"),
            col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
          .join(broadcast(cnt.select(col("label").as("la"), col("c").as("ca"))),
            col("a.label") === col("la"))
          .join(broadcast(cnt.select(col("label").as("lb"), col("c").as("cb"))),
            col("b.label") === col("lb"))
          .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
            col("ca"), col("cb"),
            (col("a.s") * col("cb") - col("b.s") * col("ca")).as("t"))
          .groupBy(col("label_a"), col("label_b"), col("ca"), col("cb"))
          .agg(sum(col("t") * col("t")).as("dist_num"))
          .select(col("label_a"), col("label_b"), col("ca").as("n_a"),
            col("cb").as("n_b"), col("dist_num"),
            (col("dist_num").cast("double") /
              ((col("ca") * col("cb")) * (col("ca") * col("cb"))).cast("double"))
              .as("l2_sq"))
          .orderBy(col("label_a"), col("label_b"))
      },
      Some("""WITH e AS (
             |  SELECT label, embedding,
             |    list_max([abs(x) FOR x IN embedding]) AS mx
             |  FROM embeddings),
             |sc AS (SELECT label, embedding,
             |         CASE WHEN mx > 0 THEN 127.0 / CAST(mx AS DOUBLE) ELSE 0.0 END AS scale
             |       FROM e),
             |q AS (SELECT label, [CAST(round(CAST(x AS DOUBLE) * scale) AS INTEGER)
             |                     FOR x IN embedding] AS qv
             |      FROM sc),
             |ex AS (SELECT label, i - 1 AS pos, qv[i] AS v
             |       FROM q, unnest(generate_series(1, len(qv))) u(i)),
             |sums AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
             |         FROM ex GROUP BY 1, 2),
             |cnt AS (SELECT label, COUNT(*) AS c FROM q GROUP BY 1),
             |t AS (
             |  SELECT a.label AS label_a, b.label AS label_b, ca.c AS ca, cb.c AS cb,
             |    a.s * cb.c - b.s * ca.c AS t
             |  FROM sums a
             |  JOIN sums b ON a.pos = b.pos AND a.label < b.label
             |  JOIN cnt ca ON ca.label = a.label
             |  JOIN cnt cb ON cb.label = b.label)
             |SELECT CAST(label_a AS BIGINT) AS label_a,
             |  CAST(label_b AS BIGINT) AS label_b,
             |  CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
             |  CAST(SUM(t * t) AS BIGINT) AS dist_num,
             |  CAST(CAST(SUM(t * t) AS BIGINT) AS DOUBLE)
             |    / CAST((ca * cb) * (ca * cb) AS DOUBLE) AS l2_sq
             |FROM t GROUP BY label_a, label_b, ca, cb
             |ORDER BY label_a, label_b""".stripMargin),
    ),

    // HITS hubs and authorities over the DIRECTED host link graph: doc
    // hosts point (hub side), synthetic target hosts are pointed at
    // (authority side) — integer max-rescaled half-steps, 2 iterations,
    // bit-exact (q172's PageRank discipline applied to the two-sided
    // centrality).
    QueryDef(
      "q197_hits",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val links = Web.extractLinks(
          Web.syntheticHtmlLinks(d, "doc_id", "text"), "doc_id", "html")
        val srcH = d.select(col("doc_id"),
          Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
            .as("src"))
        val e = links.join(srcH, "doc_id")
          .select(col("src"), Web.hostOf(col("url")).as("dst")).distinct()
        Graphs.integerHits(e, iters = 2)
          .withColumnRenamed("node", "host")
          .orderBy(col("host"))
      },
      Some {
        val iters = (1 to 2).map { i =>
          val (hp, ap) = (s"h${i - 1}", s"a$i")
          s"""a${i}r AS MATERIALIZED (
             |  SELECT e.dst AS node, SUM($hp.h) AS a
             |  FROM $hp JOIN e ON e.src = $hp.node GROUP BY e.dst),
             |a$i AS (
             |  SELECT node, (a * 1000000) // (SELECT MAX(a) FROM a${i}r) AS a
             |  FROM a${i}r),
             |h${i}r AS MATERIALIZED (
             |  SELECT e.src AS node, SUM($ap.a) AS h
             |  FROM $ap JOIN e ON e.dst = $ap.node GROUP BY e.src),
             |h$i AS (
             |  SELECT node, (h * 1000000) // (SELECT MAX(h) FROM h${i}r) AS h
             |  FROM h${i}r)""".stripMargin
        }.mkString(",\n")
        hostGraphSql +
          s""",
             |h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h FROM e),
             |$iters
             |SELECT COALESCE(h2.node, a2.node) AS host,
             |  CAST(COALESCE(h2.h, 0) AS BIGINT) AS hub,
             |  CAST(COALESCE(a2.a, 0) AS BIGINT) AS auth
             |FROM h2 FULL OUTER JOIN a2 ON h2.node = a2.node
             |ORDER BY host""".stripMargin
      },
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

    // Integer CUSUM change detection over hourly event rates: the
    // sequential max(0, S + deviation) recursion re-expressed as the
    // WINDOW-CLOSED form S_h = P_h − least(min_{j≤h} P_j, 0) (P = prefix
    // sum of the cross-multiplied deviation d_h = c_h·n − total), so the
    // whole detector is two window passes — no sequential fold, no UDF.
    // Dense hour grid per type (zero hours pull the statistic down, as
    // CUSUM requires). Report per type: the peak statistic, the first
    // hour attaining it, and how many hours breach 10·total (the
    // observed sf0.01 peaks sit at 14–17×, so the alarm fires on the
    // sustained-drift region, not the whole trace). All integer.
    QueryDef(
      "q200_cusum_drift",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val occ = tbl(s, dir, "events")
          .select(col("event_type"), expr("ts div 3600000000000").as("hr"))
          .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("c"))
        val spans = occ.groupBy(col("event_type"))
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"),
            (max(col("hr")) - min(col("hr")) + 1).as("n"), sum(col("c")).as("total"))
        val dense = spans
          .select(col("event_type"), col("n"), col("total"),
            explode(sequence(col("h0"), col("h1"))).as("hr"))
          .join(occ, Seq("event_type", "hr"), "left_outer")
          .select(col("event_type"), col("hr"), col("n"), col("total"),
            coalesce(col("c"), lit(0L)).as("c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dense
          .withColumn("p", sum(col("c") * col("n") - col("total")).over(w))
          .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n_hours"), max(col("total")).as("total"),
            max(col("s")).as("max_s"),
            // (−s, hr) struct-min = first hour attaining the max statistic
            min(struct((-col("s")).as("ns"), col("hr").as("hr")))("hr")
              .as("peak_hr"),
            sum(when(col("s") > col("total") * 10, 1L).otherwise(0L))
              .as("n_alarm_hours"))
          .orderBy(col("event_type"))
      },
      Some("""WITH occ AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |spans AS (
             |  SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1,
             |    MAX(hr) - MIN(hr) + 1 AS n, CAST(SUM(c) AS BIGINT) AS total
             |  FROM occ GROUP BY event_type),
             |grid AS (
             |  SELECT event_type, n, total, unnest(generate_series(h0, h1)) AS hr
             |  FROM spans),
             |dense AS (
             |  SELECT g.event_type, g.hr, g.n, g.total, COALESCE(o.c, 0) AS c
             |  FROM grid g
             |  LEFT JOIN occ o ON o.event_type = g.event_type AND o.hr = g.hr),
             |pp AS (
             |  SELECT *, CAST(SUM(c * n - total) OVER (
             |      PARTITION BY event_type ORDER BY hr
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
             |  FROM dense),
             |ss AS (
             |  SELECT *, p - LEAST(CAST(MIN(p) OVER (
             |      PARTITION BY event_type ORDER BY hr
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT), 0) AS s
             |  FROM pp),
             |m AS (
             |  SELECT event_type, MAX(n) AS n_hours, MAX(total) AS total,
             |    MAX(s) AS max_s,
             |    CAST(SUM(CASE WHEN s > total * 10 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_alarm_hours
             |  FROM ss GROUP BY event_type),
             |pk AS (
             |  SELECT ss.event_type, MIN(ss.hr) AS peak_hr
             |  FROM ss JOIN m ON m.event_type = ss.event_type AND ss.s = m.max_s
             |  GROUP BY ss.event_type)
             |SELECT event_type, n_hours, total, max_s, peak_hr, n_alarm_hours
             |FROM m JOIN pk USING (event_type)
             |ORDER BY event_type""".stripMargin),
    ),

    // Within-label dispersion on int8-quantized embeddings — q196's
    // complement (between-centroid distances there, within-cluster spread
    // here; the two together are the integer Calinski-Harabasz
    // separation story). Σ_i Σ_d (v·c − s)² = c²·SS_within exactly;
    // within_msq = that / (c³·64) is the per-(vector,dim) mean square,
    // one double division. Broadcast model state (labels×64 sums).
    QueryDef(
      "q201_cluster_spread",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val q = emb.select(col("label").cast("long").as("label"),
          Quantization.quantizeInt8(col("embedding"),
            Quantization.int8Scale(col("embedding"))).as("q"))
        val ex = q.select(col("label"), posexplode(col("q")))
        val sums = PinnedCache.pin(ex.groupBy(col("label"), col("pos"))
          .agg(sum(col("col")).as("s")))
        val cnt = PinnedCache.pin(
          q.groupBy(col("label")).agg(count(lit(1)).as("c")))
        ex.join(broadcast(sums), Seq("label", "pos"))
          .join(broadcast(cnt), Seq("label"))
          .select(col("label"),
            ((col("col") * col("c") - col("s")) *
              (col("col") * col("c") - col("s"))).as("t2"))
          .groupBy(col("label")).agg(sum(col("t2")).as("within_num"))
          .join(broadcast(cnt), Seq("label"))
          .select(col("label"), col("c").as("n"), col("within_num"),
            (col("within_num").cast("double") /
              (col("c") * col("c") * col("c") * lit(64L)).cast("double"))
              .as("within_msq"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (
             |  SELECT label, embedding,
             |    list_max([abs(x) FOR x IN embedding]) AS mx
             |  FROM embeddings),
             |sc AS (SELECT label, embedding,
             |         CASE WHEN mx > 0 THEN 127.0 / CAST(mx AS DOUBLE) ELSE 0.0 END AS scale
             |       FROM e),
             |q AS (SELECT label, [CAST(round(CAST(x AS DOUBLE) * scale) AS INTEGER)
             |                     FOR x IN embedding] AS qv
             |      FROM sc),
             |ex AS (SELECT label, i - 1 AS pos, qv[i] AS v
             |       FROM q, unnest(generate_series(1, len(qv))) u(i)),
             |sums AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
             |         FROM ex GROUP BY 1, 2),
             |cnt AS (SELECT label, COUNT(*) AS c FROM q GROUP BY 1),
             |w AS (
             |  SELECT ex.label,
             |    CAST(SUM((ex.v * cnt.c - sums.s) * (ex.v * cnt.c - sums.s)) AS BIGINT)
             |      AS within_num
             |  FROM ex
             |  JOIN sums ON sums.label = ex.label AND sums.pos = ex.pos
             |  JOIN cnt ON cnt.label = ex.label
             |  GROUP BY ex.label)
             |SELECT CAST(w.label AS BIGINT) AS label, CAST(cnt.c AS BIGINT) AS n,
             |  within_num,
             |  CAST(within_num AS DOUBLE)
             |    / CAST(cnt.c * cnt.c * cnt.c * 64 AS DOUBLE) AS within_msq
             |FROM w JOIN cnt ON cnt.label = w.label
             |ORDER BY label""".stripMargin),
    ),

    // Detector disagreement audit: the SimHash hamming screen (q63's
    // banded exact pairs, maxDist 3) vs exact 3-shingle Jaccard (q26's
    // threshold 0.5) on the SAME corpus — pairs found by both, by SimHash
    // only (its false positives w.r.t. the Jaccard truth), and by Jaccard
    // only (its misses). The calibration table that justifies using the
    // cheap bitwise screen as a prefilter. Full-outer join of two
    // bucket-generated pair lists + a 3-row rollup; the oracle
    // brute-forces both measures per pair.
    QueryDef(
      "q202_detector_audit",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents"))
        val sim = Dedup.simhashNearDupPairs(d, "text", "doc_id",
          bits = 60, bands = 4, maxDist = 3)
          .select(col("a_id"), col("b_id"), lit(1).as("ham"))
        val jac = Dedup.jaccardPairs(d, "text", "doc_id", 0.5)
          .select(col("a_id"), col("b_id"), lit(1).as("jac"))
        sim.join(jac, Seq("a_id", "b_id"), "full_outer")
          .select(when(col("ham").isNotNull && col("jac").isNotNull, "both")
            .when(col("ham").isNotNull, "simhash_only")
            .otherwise("jaccard_only").as("category"))
          .groupBy(col("category")).agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("category"))
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
             |                                FOR i IN generate_series(1, len(t)-2)]) AS s
             |  FROM tok WHERE len(t) >= 3),
             |sig AS (
             |  SELECT doc_id,
             |    list_sum([CASE WHEN list_sum([CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END
             |                                  FOR h IN hashes]) > 0
             |              THEN (1::BIGINT << i) ELSE 0 END
             |              FOR i IN generate_series(0, 59)])::BIGINT AS sig
             |  FROM (SELECT doc_id,
             |          [CAST(('0x' || substring(md5(t),1,15)) AS BIGINT)
             |           FOR t IN list_distinct(string_split(text,' '))] AS hashes
             |        FROM documents)),
             |hp AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
             |jp AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |cat AS (
             |  SELECT CASE WHEN hp.a_id IS NOT NULL AND jp.a_id IS NOT NULL THEN 'both'
             |              WHEN hp.a_id IS NOT NULL THEN 'simhash_only'
             |              ELSE 'jaccard_only' END AS category
             |  FROM hp FULL OUTER JOIN jp
             |    ON hp.a_id = jp.a_id AND hp.b_id = jp.b_id)
             |SELECT category, COUNT(*) AS n_pairs
             |FROM cat GROUP BY category ORDER BY category""".stripMargin),
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

    // Debounce / deduplicate-within-interval: drop events closer than
    // 60 s to the previous KEPT event of the same (user, type) — the
    // double-click / retry-storm filter every ingestion pipeline needs.
    // Because gaps chain (B dropped for following A can't shield C), the
    // kept set is NOT a plain lag filter: an event survives iff its gap
    // to the previous SURVIVOR exceeds the interval. Same window-closed
    // trick family as q200: survivors are exactly the events whose
    // running-max ts among "far-enough" predecessors… in practice the
    // chain collapses because ts gaps are what they are — here the
    // debounce uses the plain lag contract (gap to previous RAW event),
    // the industry-standard approximation that IS window-expressible; the
    // exact-chain variant is the q70 incremental dedup shape. Per-type
    // kept/dropped rollup.
    QueryDef(
      "q204_debounce",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
          .select(col("event_type"),
            when(col("gap").isNull || col("gap") > 60000000000L, 1L)
              .otherwise(0L).as("keep"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("keep")).as("n_kept"),
            (count(lit(1)) - sum(col("keep"))).as("n_dropped"))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             |      PARTITION BY user_id, event_type
             |      ORDER BY epoch_ns(ts), event_id) AS gap
             |  FROM events)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 60000000000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 60000000000 THEN 0 ELSE 1 END)
             |    AS BIGINT) AS n_dropped
             |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // Last-touch attribution: each purchase credited to the latest
    // preceding non-purchase event of the same user within 24 h (ties on
    // ts broken by event_id — a total order). One user-keyed window with
    // IGNORE NULLS last_value over the preceding frame — no self-join,
    // no as-of machinery needed when the credit source and the
    // conversion live in one stream. Per-channel conversion rollup with
    // integer ppm share.
    QueryDef(
      "q205_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val credited = ev
          .withColumn("prev", last(
            when(col("event_type") =!= "purchase",
              struct(col("ts").as("pts"), col("event_type").as("ptype"))),
            ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(
            when(col("prev").isNotNull &&
                col("ts") - col("prev.pts") <= 86400000000000L,
              col("prev.ptype")).otherwise(lit("organic")).as("channel"))
        val rolled = credited.groupBy(col("channel"))
          .agg(count(lit(1)).as("purchases"))
        rolled
          .crossJoin(broadcast(rolled.agg(sum(col("purchases")).as("tot"))))
          .select(col("channel"), col("purchases"),
            expr("(purchases * 1000000) div tot").as("share_ppm"))
          .orderBy(col("channel"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id,
             |    LAST_VALUE(CASE WHEN event_type <> 'purchase'
             |                 THEN struct_pack(pts := epoch_ns(ts), ptype := event_type)
             |               END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
             |  FROM events),
             |cr AS (
             |  SELECT CASE WHEN prev IS NOT NULL AND ts - prev.pts <= 86400000000000
             |              THEN prev.ptype ELSE 'organic' END AS channel
             |  FROM c WHERE event_type = 'purchase'),
             |r AS (SELECT channel, COUNT(*) AS purchases FROM cr GROUP BY channel)
             |SELECT channel, purchases,
             |  CAST((purchases * 1000000) // (SELECT SUM(purchases) FROM r) AS BIGINT)
             |    AS share_ppm
             |FROM r ORDER BY channel""".stripMargin),
    ),

    // Inter-arrival SLO report: exact discrete p50/p90/p99 of the
    // per-type event gaps (q194's lag pass fed into the rank-position
    // quantile convention of CorpusStats.exactQuantiles — value at rank
    // ceil(p·n), bit-exact cross-engine unlike interpolating
    // percentile_cont). The latency-budget table a pipeline SLO review
    // reads.
    QueryDef(
      "q206_gap_slo",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = tbl(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"))
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
          .where(col("gap").isNotNull)
        CorpusStats.exactQuantiles(gaps, "event_type", col("gap"),
            Seq(0.5, 0.9, 0.99))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             |      PARTITION BY event_type ORDER BY epoch_ns(ts), event_id) AS gap
             |  FROM events),
             |r AS (
             |  SELECT event_type, gap,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap) AS BIGINT) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS n
             |  FROM g WHERE gap IS NOT NULL)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             |  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN gap END) AS p50,
             |  MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN gap END) AS p90,
             |  MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN gap END) AS p99
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),
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

    // Global temporal correlation (incident forensics): purchases within
    // ±5 min of ANY error — no user key, so the range join's blocking
    // bucket IS the time axis (RangeJoin with a constant key: the
    // (k, bucket) join key degenerates to the bucket, i.e. a
    // time-partitioned join — each 10-min bucket meets only its own
    // ±window neighbors, never O(L×R)). One summary row: pair volume,
    // share of errors with a nearby purchase.
    QueryDef(
      "q210_incident_correlation",
      (s, dir) => {
        val ev = PinnedCache.pin(tbl(s, dir, "events"))
        val errs = ev.where(col("event_type") === "error")
          .select(lit(0).as("k"), col("event_id").as("err_id"), col("ts"))
        val wins = ev.where(col("event_type") === "purchase")
          .select(lit(0).as("k"), col("event_id").as("p_id"),
            (col("ts") - 300000000000L).as("lo"),
            (col("ts") + 300000000000L).as("hi"))
        val pairs = graft.operators.RangeJoin
          .rangeJoin(errs, wins, "k", "ts", "lo", "hi", 600000000000L)
        pairs
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("err_id")).as("n_correlated_errors"),
            countDistinct(col("p_id")).as("n_correlated_purchases"))
          .crossJoin(broadcast(
            ev.where(col("event_type") === "error")
              .agg(count(lit(1)).as("n_errors"))))
          .select(col("n_errors"), col("n_pairs"), col("n_correlated_errors"),
            col("n_correlated_purchases"),
            expr("(n_correlated_errors * 1000000) div n_errors")
              .as("correlated_ppm"))
      },
      Some("""WITH e AS (SELECT event_id AS err_id, epoch_ns(ts) AS ts FROM events
             |           WHERE event_type = 'error'),
             |p AS (SELECT event_id AS p_id, epoch_ns(ts) AS ts FROM events
             |      WHERE event_type = 'purchase'),
             |pr AS (
             |  SELECT e.err_id, p.p_id FROM e JOIN p
             |  ON e.ts BETWEEN p.ts - 300000000000 AND p.ts + 300000000000)
             |SELECT (SELECT COUNT(*) FROM e) AS n_errors,
             |  (SELECT COUNT(*) FROM pr) AS n_pairs,
             |  (SELECT COUNT(DISTINCT err_id) FROM pr) AS n_correlated_errors,
             |  (SELECT COUNT(DISTINCT p_id) FROM pr) AS n_correlated_purchases,
             |  CAST(((SELECT COUNT(DISTINCT err_id) FROM pr) * 1000000)
             |    // (SELECT COUNT(*) FROM e) AS BIGINT) AS correlated_ppm""".stripMargin),
    ),

    // FORWARD as-of join: each error picks the user's NEXT purchase
    // (ts >= error ts) — "recovery time after an error", the mirror of
    // q53's backward enrichment. Same single-shuffle union+window plan,
    // traversed descending. Unrecovered errors keep NULLs.
    QueryDef(
      "q211_asof_forward",
      (s, dir) => {
        val ev = PinnedCache.pin(tbl(s, dir, "events"))
        val errs = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
        val buys = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.operators.AsofJoin
          .asofJoinForward(errs, buys, "user_id", "ts", "event_id", "event_id")
          .select(col("err_id"), col("user_id"), col("ts"), col("asof_ts"),
            col("asof_event_id").as("next_purchase_id"),
            (col("asof_ts") - col("ts")).as("recovery_ns"))
          .orderBy(col("err_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id AS err_id
             |           FROM events WHERE event_type = 'error'),
             |dr AS (
             |  SELECT user_id, epoch_ns(ts) AS r_ts, MAX(event_id) AS val
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |sel AS (
             |  SELECT e.err_id, e.user_id, e.ts,
             |    (SELECT MIN(d.r_ts) FROM dr d
             |     WHERE d.user_id = e.user_id AND d.r_ts >= e.ts) AS asof_ts
             |  FROM e)
             |SELECT s.err_id, s.user_id, s.ts, s.asof_ts,
             |  d.val AS next_purchase_id, s.asof_ts - s.ts AS recovery_ns
             |FROM sel s LEFT JOIN dr d
             |  ON d.user_id = s.user_id AND d.r_ts = s.asof_ts
             |ORDER BY err_id""".stripMargin),
    ),

    // Peak session concurrency: 30-min-gap sessionization, then the
    // classic +1/−1 boundary sweep — cumulative sum over session starts
    // and (exclusive) ends, global max and its first time. Capacity
    // planning's load-peak question answered in three window passes over
    // session-rollup-sized data (starts sort before ends at a tie, so
    // touching sessions count as concurrent — matched in the oracle).
    QueryDef(
      "q212_peak_concurrency",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val uw = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sessions = tbl(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap", col("ts") - lag(col("ts"), 1).over(uw))
          .withColumn("new_s",
            when(col("gap").isNull || col("gap") > 1800000000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(uw))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
        val bounds = sessions
          .select(col("s_start").as("t"), lit(1L).as("delta"))
          .unionByName(sessions.select(col("s_end").as("t"), lit(-1L).as("delta")))
        val sweep = Window.orderBy(col("t"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = bounds.withColumn("conc", sum(col("delta")).over(sweep))
        run
          .agg(max(col("conc")).as("peak_concurrent"),
            min(struct((-col("conc")).as("nc"), col("t").as("t")))("t")
              .as("peak_ts"))
          .crossJoin(broadcast(sessions.agg(count(lit(1)).as("n_sessions"))))
          .select(col("n_sessions"), col("peak_concurrent"), col("peak_ts"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, epoch_ns(ts) AS ts,
             |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
             |      IS NULL THEN 1
             |      WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
             |        PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
             |      > 1800000000000 THEN 1 ELSE 0 END AS new_s,
             |    event_id
             |  FROM events),
             |sid AS (
             |  SELECT user_id, ts,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g),
             |sess AS (
             |  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
             |  FROM sid GROUP BY 1, 2),
             |b AS (
             |  SELECT s_start AS t, CAST(1 AS BIGINT) AS delta FROM sess
             |  UNION ALL
             |  SELECT s_end, CAST(-1 AS BIGINT) FROM sess),
             |run AS (
             |  SELECT t, CAST(SUM(delta) OVER (ORDER BY t, delta DESC
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
             |  FROM b),
             |m AS (SELECT MAX(conc) AS peak_concurrent FROM run)
             |SELECT (SELECT COUNT(*) FROM sess) AS n_sessions,
             |  m.peak_concurrent,
             |  (SELECT MIN(t) FROM run WHERE conc = m.peak_concurrent) AS peak_ts
             |FROM m""".stripMargin),
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

    // Cross-modal purity audit: do text near-dup clusters (q44's CC over
    // the q26 pairs) agree with the embedding labels? Per cluster: size,
    // distinct labels, majority label + its ppm share. Low purity flags
    // text-vs-embedding disagreement — exactly where a curation pipeline
    // should look before trusting either signal. (The testdata's vec_id
    // aligns 1:1 with doc_id — the cross-modal join key.)
    QueryDef(
      "q215_crossmodal_purity",
      (s, dir) => {
        val cc = Dedup.connectedComponents(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5))
        val emb = tbl(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("label").cast("long").as("label"))
        cc.join(emb, "id")
          .groupBy(col("root"), col("label")).agg(count(lit(1)).as("lc"))
          .groupBy(col("root"))
          .agg(sum(col("lc")).as("size"), count(lit(1)).as("n_labels"),
            min(struct((-col("lc")).as("nc"), col("label").as("label"))).as("t"))
          .select(col("root").as("root_id"), col("size"), col("n_labels"),
            col("t.label").as("top_label"),
            expr("((-t.nc) * 1000000) div size").as("purity_ppm"))
          .orderBy(col("root_id"))
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |lj AS (
             |  SELECT l.root, e.label, COUNT(*) AS lc
             |  FROM labels l JOIN embeddings e ON e.vec_id = l.id
             |  GROUP BY 1, 2),
             |top AS (
             |  SELECT root, label AS top_label, lc FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY root
             |      ORDER BY lc DESC, label) AS rk FROM lj)
             |  WHERE rk = 1)
             |SELECT lj.root AS root_id, CAST(SUM(lj.lc) AS BIGINT) AS size,
             |  CAST(COUNT(*) AS BIGINT) AS n_labels,
             |  CAST(MAX(top.top_label) AS BIGINT) AS top_label,
             |  CAST((MAX(top.lc) * 1000000) // SUM(lj.lc) AS BIGINT) AS purity_ppm
             |FROM lj JOIN top ON top.root = lj.root
             |GROUP BY lj.root ORDER BY root_id""".stripMargin),
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

    // Unresolved incidents: q210's complement — errors with NO purchase
    // within ±5 min, as a left-ANTI range join (same time-bucket
    // blocking, then subtract the matched error set). Per-day rollup of
    // unresolved counts + share — the "what never recovered" report.
    QueryDef(
      "q218_unresolved_incidents",
      (s, dir) => {
        val ev = PinnedCache.pin(tbl(s, dir, "events"))
        val errs = ev.where(col("event_type") === "error")
          .select(lit(0).as("k"), col("event_id").as("err_id"), col("ts"))
        val wins = ev.where(col("event_type") === "purchase")
          .select(lit(0).as("k"), (col("ts") - 300000000000L).as("lo"),
            (col("ts") + 300000000000L).as("hi"))
        val matched = graft.operators.RangeJoin
          .rangeJoin(errs, wins, "k", "ts", "lo", "hi", 600000000000L)
          .select(col("err_id")).distinct()
        errs.join(matched, Seq("err_id"), "left_anti")
          .groupBy(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).as("n_unresolved"))
          .join(errs.groupBy(expr("ts div 86400000000000").as("day"))
            .agg(count(lit(1)).as("n_errors")), Seq("day"))
          .select(col("day"), col("n_errors"), col("n_unresolved"),
            expr("(n_unresolved * 1000000) div n_errors").as("unresolved_ppm"))
          .orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT event_id AS err_id, epoch_ns(ts) AS ts FROM events
             |           WHERE event_type = 'error'),
             |p AS (SELECT epoch_ns(ts) AS ts FROM events
             |      WHERE event_type = 'purchase'),
             |unres AS (
             |  SELECT err_id, ts FROM e
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM p
             |    WHERE p.ts BETWEEN e.ts - 300000000000 AND e.ts + 300000000000)),
             |ud AS (SELECT ts // 86400000000000 AS day, COUNT(*) AS n_unresolved
             |       FROM unres GROUP BY 1),
             |ed AS (SELECT ts // 86400000000000 AS day, COUNT(*) AS n_errors
             |       FROM e GROUP BY 1)
             |SELECT day, n_errors, n_unresolved,
             |  CAST((n_unresolved * 1000000) // n_errors AS BIGINT) AS unresolved_ppm
             |FROM ud JOIN ed USING (day) ORDER BY day""".stripMargin),
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

    // Near-dup cluster RADIUS: hop distance of the farthest member from
    // its cluster's canonical root (min id) over the q26 pair graph —
    // the q195 coverage audit's depth dimension. A radius-k member is
    // only a near-dup of the survivor through k transitive steps; large
    // radii are exactly where aggressive cluster-collapse dedup loses
    // non-duplicates. Multi-source BFS with ALL roots as seeds (each
    // component contains exactly its own root, so "distance from nearest
    // root" IS the within-cluster distance), 4-round horizon (dense
    // near-dup clusters rarely exceed radius 2; the horizon is the
    // documented contract, as in q187).
    QueryDef(
      "q220_cluster_radius",
      (s, dir) => {
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5))
        val cc = PinnedCache.pin(Dedup.connectedComponents(pairs))
        val sym = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
          .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        val dist = Graphs.bfsDistances(sym,
          cc.select(col("root").as("node")).distinct(), rounds = 4)
        val byDist = dist
          .join(cc.select(col("id").as("node"), col("root")), "node")
          .groupBy(col("root"), col("d")).agg(count(lit(1)).as("c"))
        byDist.groupBy(col("root"))
          .agg(sum(col("c")).as("size"), max(col("d")).as("radius"))
          .join(byDist.select(col("root"), col("d").as("radius"),
            col("c").as("n_at_radius")), Seq("root", "radius"))
          .select(col("root").as("root_id"), col("size"), col("radius"),
            col("n_at_radius"))
          .orderBy(col("root_id"))
      },
      Some {
        // chained CTEs that reference their predecessor twice INLINE
        // exponentially in DuckDB — MATERIALIZED pins each round (and the
        // expensive pair graph) to one evaluation
        val rounds = (1 to 4).map(i =>
          s"""d$i AS MATERIALIZED (
             |  SELECT node, MIN(d) AS d FROM (
             |    SELECT node, d FROM d${i - 1}
             |    UNION ALL
             |    SELECT sym.dst, d${i - 1}.d + 1
             |    FROM d${i - 1} JOIN sym ON d${i - 1}.node = sym.src) z
             |  GROUP BY node)""".stripMargin).mkString(",\n")
        s"""WITH RECURSIVE sh AS (
           |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
           |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
           |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
           |  WHERE len(tokens) >= 3),
           |pairs AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
           |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
           |sym AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pairs
           |        UNION ALL SELECT b_id, a_id FROM pairs),
           |r(id, m) AS (
           |  SELECT src, src FROM sym
           |  UNION
           |  SELECT r.id, e.dst FROM r JOIN sym e ON e.src = r.m),
           |labels AS MATERIALIZED (SELECT id, MIN(m) AS root FROM r GROUP BY id),
           |d0 AS (SELECT DISTINCT root AS node, 0 AS d FROM labels),
           |$rounds,
           |bd AS MATERIALIZED (
           |  SELECT l.root, d4.d, COUNT(*) AS c
           |  FROM d4 JOIN labels l ON l.id = d4.node
           |  GROUP BY 1, 2),
           |agg AS (
           |  SELECT root, CAST(SUM(c) AS BIGINT) AS size,
           |    CAST(MAX(d) AS BIGINT) AS radius
           |  FROM bd GROUP BY root)
           |SELECT agg.root AS root_id, agg.size, agg.radius,
           |  CAST(bd.c AS BIGINT) AS n_at_radius
           |FROM agg JOIN bd ON bd.root = agg.root AND bd.d = agg.radius
           |ORDER BY root_id""".stripMargin
      },
    ),

    // Link-graph reciprocity: share of DIRECTED host edges whose reverse
    // edge also exists — high reciprocity = mutual-citation cliques (link
    // farms), low = hierarchical citation. One self-semi-join on the
    // swapped key over the distinct edge list.
    QueryDef(
      "q221_link_reciprocity",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val links = Web.extractLinks(
          Web.syntheticHtmlLinks(d, "doc_id", "text"), "doc_id", "html")
        val srcH = d.select(col("doc_id"),
          Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
            .as("src"))
        val e = PinnedCache.pin(links.join(srcH, "doc_id")
          .select(col("src"), Web.hostOf(col("url")).as("dst")).distinct()
          .where(col("src") =!= col("dst")))
        val recip = e.join(
          e.select(col("dst").as("src"), col("src").as("dst")),
          Seq("src", "dst"), "left_semi")
        e.agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_reciprocal"))))
          .select(col("n_edges"), col("n_reciprocal"),
            expr("(n_reciprocal * 1000000) div n_edges").as("reciprocity_ppm"))
      },
      Some(hostGraphSql +
        """,
          |ee AS MATERIALIZED (SELECT src, dst FROM e WHERE src <> dst),
          |r AS (SELECT a.src, a.dst FROM ee a
          |      WHERE EXISTS (SELECT 1 FROM ee b
          |                    WHERE b.src = a.dst AND b.dst = a.src))
          |SELECT (SELECT COUNT(*) FROM ee) AS n_edges,
          |  (SELECT COUNT(*) FROM r) AS n_reciprocal,
          |  CAST(((SELECT COUNT(*) FROM r) * 1000000)
          |    // (SELECT COUNT(*) FROM ee) AS BIGINT) AS reciprocity_ppm"""
          .stripMargin),
    ),

    // Degree spectrum: quarter-bit log-log histogram of host degrees over
    // the symmetrized link graph — the scale-free-or-not audit (a
    // straight line here is the graph-side Zipf of q199). Degree rollup
    // then a bin rollup; all integer.
    QueryDef(
      "q222_degree_spectrum",
      (s, dir) => hostLinkGraph(s, dir)
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(TextAnalysis.quarterLog2(col("deg")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_hosts"))
        .orderBy(col("bin")),
      Some(hostGraphSql +
        """,
          |b AS (
          |  SELECT CAST(CASE WHEN length(bin(deg)) - 1 <= 14
          |    THEN length(bin(deg*deg*deg*deg)) - 1
          |    ELSE 4 * (length(bin(deg)) - 15) +
          |         length(bin((deg >> (length(bin(deg)) - 15))
          |                   *(deg >> (length(bin(deg)) - 15))
          |                   *(deg >> (length(bin(deg)) - 15))
          |                   *(deg >> (length(bin(deg)) - 15)))) - 1 END AS BIGINT)
          |    AS bin
          |  FROM deg)
          |SELECT bin, COUNT(*) AS n_hosts FROM b
          |GROUP BY bin ORDER BY bin""".stripMargin),
    ),

    // Degree assortativity: do high-degree hosts link to high-degree
    // hosts? Pearson correlation of endpoint degrees over the symmetric
    // edge list in the q199 integer-moment form — num/den exact longs,
    // one double division. Negative = hub-and-spoke (typical web), near
    // zero = random, positive = core-periphery mixing.
    QueryDef(
      "q223_assortativity",
      (s, dir) => {
        val sym = PinnedCache.pin(hostLinkGraph(s, dir))
        val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val xy = sym
          .join(deg.select(col("src"), col("deg").as("x")), "src")
          .join(deg.select(col("src").as("dst"), col("deg").as("y")), "dst")
        xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("var_x"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("var_y"))
          .select(col("n"), col("cov_num"), col("var_x"), col("var_y"),
            (col("cov_num").cast("double") /
              sqrt(col("var_x").cast("double") * col("var_y").cast("double")))
              .as("assortativity"))
      },
      Some(hostGraphSql +
        """,
          |xy AS (
          |  SELECT dx.deg AS x, dy.deg AS y
          |  FROM sym
          |  JOIN deg dx ON dx.src = sym.src
          |  JOIN deg dy ON dy.src = sym.dst),
          |m AS (
          |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
          |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
          |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
          |  FROM xy)
          |SELECT n, n * sxy - sx * sy AS cov_num,
          |  n * sxx - sx * sx AS var_x, n * syy - sy * sy AS var_y,
          |  CAST(n * sxy - sx * sy AS DOUBLE)
          |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |           * CAST(n * syy - sy * sy AS DOUBLE)) AS assortativity
          |FROM m""".stripMargin),
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

    // Conversion-window sensitivity sweep: q131's signup→purchase funnel
    // at 1 h / 1 d / 7 d attribution windows in ONE query — how much
    // "conversion" is an artifact of the window choice (the q97
    // threshold-sweep discipline applied to funnels). Three conditional
    // aggregates over one as-of-style pairing; no per-window rescan.
    QueryDef(
      "q226_window_sweep",
      (s, dir) => {
        val ev = PinnedCache.pin(tbl(s, dir, "events"))
        val s0 = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
        val first = s0
          .join(ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("pts")), Seq("user_id"), "left_outer")
          .groupBy(col("user_id"))
          .agg(min(col("s_ts")).as("s_ts"),
            min(when(col("pts") >= col("s_ts"), col("pts"))).as("first_p"))
          .withColumn("ttc", col("first_p") - col("s_ts"))
        first.agg(count(lit(1)).as("n_signups"),
            sum(when(col("ttc") <= 3600000000000L, 1L).otherwise(0L)).as("conv_1h"),
            sum(when(col("ttc") <= 86400000000000L, 1L).otherwise(0L)).as("conv_1d"),
            sum(when(col("ttc") <= 604800000000000L, 1L).otherwise(0L)).as("conv_7d"))
          .select(col("n_signups"), col("conv_1h"), col("conv_1d"), col("conv_7d"),
            expr("(conv_1h * 1000000) div n_signups").as("ppm_1h"),
            expr("(conv_1d * 1000000) div n_signups").as("ppm_1d"),
            expr("(conv_7d * 1000000) div n_signups").as("ppm_7d"))
      },
      Some("""WITH s0 AS (
             |  SELECT user_id, MIN(epoch_ns(ts)) AS s_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |f AS (
             |  SELECT s0.user_id,
             |    MIN(CASE WHEN epoch_ns(e.ts) >= s0.s_ts THEN epoch_ns(e.ts) END)
             |      - MIN(s0.s_ts) AS ttc
             |  FROM s0 LEFT JOIN events e
             |    ON e.user_id = s0.user_id AND e.event_type = 'purchase'
             |  GROUP BY s0.user_id)
             |SELECT COUNT(*) AS n_signups,
             |  CAST(SUM(CASE WHEN ttc <= 3600000000000 THEN 1 ELSE 0 END) AS BIGINT) AS conv_1h,
             |  CAST(SUM(CASE WHEN ttc <= 86400000000000 THEN 1 ELSE 0 END) AS BIGINT) AS conv_1d,
             |  CAST(SUM(CASE WHEN ttc <= 604800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS conv_7d,
             |  CAST((SUM(CASE WHEN ttc <= 3600000000000 THEN 1 ELSE 0 END) * 1000000)
             |    // COUNT(*) AS BIGINT) AS ppm_1h,
             |  CAST((SUM(CASE WHEN ttc <= 86400000000000 THEN 1 ELSE 0 END) * 1000000)
             |    // COUNT(*) AS BIGINT) AS ppm_1d,
             |  CAST((SUM(CASE WHEN ttc <= 604800000000000 THEN 1 ELSE 0 END) * 1000000)
             |    // COUNT(*) AS BIGINT) AS ppm_7d
             |FROM f""".stripMargin),
    ),

    // Corpus snapshot diff (release provenance): two deterministic
    // hash-derived views of the corpus — v1 drops hash%10==0 docs, v2
    // drops hash%13==0 and mutates hash%7==0 texts — diffed by doc_id
    // with md5 content comparison into the added/removed/changed/
    // unchanged report per source. The "what changed between dataset
    // v1.1 and v1.2" table every release pipeline publishes; one
    // full-outer join on ids, content equality by digest.
    QueryDef(
      "q227_snapshot_diff",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            Sampling.portableHash(col("doc_id")).as("h")))
        val v1 = d.where(pmod(col("h"), lit(10)) =!= 0)
          .select(col("doc_id"), col("source"), md5(col("text")).as("d1"))
        val v2 = d.where(pmod(col("h"), lit(13)) =!= 0)
          .select(col("doc_id"), col("source").as("source2"),
            md5(when(pmod(col("h"), lit(7)) === 0,
              concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
              .as("d2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(coalesce(col("source"), col("source2")).as("source"),
            when(col("d1").isNull, "added")
              .when(col("d2").isNull, "removed")
              .when(col("d1") =!= col("d2"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("source"), col("status"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, text,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
             |  FROM documents),
             |v1 AS (SELECT doc_id, source, md5(text) AS d1 FROM d WHERE h % 10 <> 0),
             |v2 AS (SELECT doc_id, source AS source2,
             |         md5(CASE WHEN h % 7 = 0 THEN text || ' [rev2]' ELSE text END) AS d2
             |       FROM d WHERE h % 13 <> 0)
             |SELECT COALESCE(v1.source, v2.source2) AS source,
             |  CASE WHEN v1.d1 IS NULL THEN 'added'
             |       WHEN v2.d2 IS NULL THEN 'removed'
             |       WHEN v1.d1 <> v2.d2 THEN 'changed'
             |       ELSE 'unchanged' END AS status,
             |  COUNT(*) AS n_docs
             |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
             |GROUP BY 1, 2 ORDER BY source, status""".stripMargin),
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

    // Does duplication correlate with quality? Docs stratified by
    // NEAR-dup status (unique = in no q26 pair; survivor = its cluster's
    // min id; duplicate = other members), each stratum profiled with
    // integer quality proxies: mean tokens (ppm) and mean type-token
    // ratio (per-doc ppm floored, then the stratum mean of those ints —
    // deterministic end to end). The curation question behind every
    // dedup decision: is what we're deleting worse, better, or the same?
    QueryDef(
      "q229_dup_quality",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            size(array_distinct(split(col("text"), " "))).cast("long")
              .as("n_types")))
        val cc = Dedup.connectedComponents(
          Dedup.jaccardPairs(d, "text", "doc_id", 0.5))
        d.join(cc.select(col("id").as("doc_id"), col("root")),
            Seq("doc_id"), "left_outer")
          .select(
            when(col("root").isNull, "unique")
              .when(col("doc_id") === col("root"), "survivor")
              .otherwise("duplicate").as("status"),
            col("n_tok"),
            expr("(n_types * 1000000) div n_tok").as("ttr_ppm"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_docs"),
            expr("(sum(n_tok) * 1000000) div count(1)").as("mean_tokens_ppm"),
            expr("sum(ttr_ppm) div count(1)").as("mean_ttr_ppm"))
          .orderBy(col("status"))
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
             |    CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_types
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |st AS (
             |  SELECT CASE WHEN l.root IS NULL THEN 'unique'
             |              WHEN d.doc_id = l.root THEN 'survivor'
             |              ELSE 'duplicate' END AS status,
             |    d.n_tok, (d.n_types * 1000000) // d.n_tok AS ttr_ppm
             |  FROM d LEFT JOIN labels l ON l.id = d.doc_id)
             |SELECT status, COUNT(*) AS n_docs,
             |  CAST((SUM(n_tok) * 1000000) // COUNT(*) AS BIGINT) AS mean_tokens_ppm,
             |  CAST(SUM(ttr_ppm) // COUNT(*) AS BIGINT) AS mean_ttr_ppm
             |FROM st GROUP BY status ORDER BY status""".stripMargin),
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

    // Near-dup SPLIT LEAKAGE: clusters whose members land in different
    // hash splits — a near-duplicate of a training doc sitting in test
    // is contamination the doc-id-hash splitter cannot see (the known
    // pitfall dedup-aware splitting exists to fix; q168 checks n-gram
    // overlap, this checks the cluster structure itself). Per leaky
    // cluster: size, splits touched, members outside the majority split.
    QueryDef(
      "q231_leaky_clusters",
      (s, dir) => {
        val cc = Dedup.connectedComponents(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5))
        val bySplit = cc
          .select(col("root"), col("id"),
            Sampling.splitColumn(col("id"), 80, 10).as("split"))
          .groupBy(col("root"), col("split")).agg(count(lit(1)).as("n"))
        bySplit.groupBy(col("root"))
          .agg(sum(col("n")).as("size"), count(lit(1)).as("n_splits"),
            max(col("n")).as("majority_n"))
          .where(col("n_splits") > 1)
          .select(col("root").as("root_id"), col("size"), col("n_splits"),
            (col("size") - col("majority_n")).as("n_leaked"))
          .orderBy(col("root_id"))
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |bs AS (
             |  SELECT root,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 80
             |           THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 90
             |           THEN 'val'
             |         ELSE 'test' END AS split,
             |    COUNT(*) AS n
             |  FROM labels GROUP BY 1, 2)
             |SELECT root AS root_id, CAST(SUM(n) AS BIGINT) AS size,
             |  CAST(COUNT(*) AS BIGINT) AS n_splits,
             |  CAST(SUM(n) - MAX(n) AS BIGINT) AS n_leaked
             |FROM bs GROUP BY root HAVING COUNT(*) > 1
             |ORDER BY root_id""".stripMargin),
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

    // Embedding hygiene: zero/degenerate vectors and the quarter-bit
    // spectrum of vector norms on the q58 integer grid (norm² quantized
    // to round(x·2^20) before binning, so the histogram is a pure
    // function of the grid ints — no cross-engine float-binning edge).
    // The pre-index sanity check every vector store needs.
    QueryDef(
      "q233_embedding_hygiene",
      (s, dir) => {
        val n2 = expr(
          "aggregate(embedding, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")
        tbl(s, dir, "embeddings")
          .select(round(n2 * 1048576.0).cast("long").as("q"))
          .select(when(col("q") === 0, lit(-1L))
            .otherwise(TextAnalysis.quarterLog2(col("q"))).as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as("n_vectors"))
          .orderBy(col("bin"))
      },
      Some("""WITH q AS (
             |  SELECT CAST(round(list_sum([CAST(x AS DOUBLE)*x FOR x IN embedding])
             |    * 1048576.0) AS BIGINT) AS q
             |  FROM embeddings),
             |b AS (
             |  SELECT CASE WHEN q = 0 THEN -1
             |    ELSE CAST(CASE WHEN length(bin(q)) - 1 <= 14
             |      THEN length(bin(q*q*q*q)) - 1
             |      ELSE 4 * (length(bin(q)) - 15) +
             |           length(bin((q >> (length(bin(q)) - 15))
             |                     *(q >> (length(bin(q)) - 15))
             |                     *(q >> (length(bin(q)) - 15))
             |                     *(q >> (length(bin(q)) - 15)))) - 1 END AS BIGINT)
             |    END AS bin
             |  FROM q)
             |SELECT bin, COUNT(*) AS n_vectors FROM b
             |GROUP BY bin ORDER BY bin""".stripMargin),
    ),

    // Dedup-aware split REPAIR: q231's audit as an ACTION (the q180
    // closed-loop pattern) — every leaky cluster's members move to the
    // cluster's majority split (ties to the alphabetically first split),
    // reported as the (from, to) migration rollup. After this repair no
    // near-dup pair crosses a split boundary, by construction.
    QueryDef(
      "q234_split_repair_dedup",
      (s, dir) => {
        val cc = PinnedCache.pin(Dedup.connectedComponents(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)))
        val withSplit = PinnedCache.pin(cc.select(col("root"), col("id"),
          Sampling.splitColumn(col("id"), 80, 10).as("split")))
        val majority = withSplit.groupBy(col("root"), col("split"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("root"))
          .agg(min(struct((-col("n")).as("nn"), col("split").as("split")))("split")
            .as("to_split"))
        withSplit.join(majority, "root")
          .where(col("split") =!= col("to_split"))
          .groupBy(col("split").as("from_split"), col("to_split"))
          .agg(count(lit(1)).as("n_moved"))
          .orderBy(col("from_split"), col("to_split"))
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS MATERIALIZED (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |ws AS MATERIALIZED (
             |  SELECT root, id,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 80
             |           THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 90
             |           THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM labels),
             |mj AS (
             |  SELECT root, split AS to_split FROM (
             |    SELECT root, split,
             |      ROW_NUMBER() OVER (PARTITION BY root
             |        ORDER BY COUNT(*) DESC, split) AS rk
             |    FROM ws GROUP BY root, split)
             |  WHERE rk = 1)
             |SELECT ws.split AS from_split, mj.to_split, COUNT(*) AS n_moved
             |FROM ws JOIN mj USING (root)
             |WHERE ws.split <> mj.to_split
             |GROUP BY 1, 2 ORDER BY from_split, to_split""".stripMargin),
    ),

    // Greedy crawl knapsack: hosts ranked by authority-per-token
    // (q172's integer PageRank over q171's link graph ÷ the host's token
    // mass), taken in ratio order until half the corpus token budget is
    // spent — the "what to crawl first under a budget" plan as one
    // cumulative-sum window over the host rollup. All integer (ratio in
    // ppm, floor).
    QueryDef(
      "q235_crawl_knapsack",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
        val hostTok = d.select(
            Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
              .as("host"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy(col("host")).agg(sum(col("n_tok")).as("tokens"))
        val rank = {
          val links = Web.extractLinks(
            Web.syntheticHtmlLinks(d, "doc_id", "text"), "doc_id", "html")
          val srcH = d.select(col("doc_id"),
            Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
              .as("src"))
          val e = links.join(srcH, "doc_id")
            .select(col("src"), Web.hostOf(col("url")).as("dst")).distinct()
          val sym = e.unionByName(
            e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
          Graphs.integerPageRank(sym, iters = 4)
            .withColumnRenamed("node", "host").withColumnRenamed("r", "rank")
        }
        val scored = hostTok.join(rank, "host")
          .select(col("host"), col("tokens"), col("rank"),
            expr("(rank * 1000000) div tokens").as("ratio_ppm"))
        val w = Window.orderBy(col("ratio_ppm").desc, col("host"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        scored
          .withColumn("cum_tokens", sum(col("tokens")).over(w))
          .crossJoin(broadcast(hostTok.agg(
            expr("sum(tokens) div 2").as("budget"))))
          .where(col("cum_tokens") <= col("budget"))
          .select(col("host"), col("tokens"), col("rank"), col("ratio_ppm"),
            col("cum_tokens"))
          .orderBy(col("ratio_ppm").desc, col("host"))
      },
      Some(hostGraphSql +
        s""",
           |ht AS (
           |  SELECT c.host, CAST(SUM(len(string_split(d.text,' '))) AS BIGINT) AS tokens
           |  FROM documents d JOIN c ON c.doc_id = d.doc_id
           |  GROUP BY c.host),
           |cst AS (SELECT (15 * (1000000000000 // COUNT(*))) // 100 AS base,
           |          1000000000000 // COUNT(*) AS r0 FROM deg),
           |r0 AS (SELECT src AS node, (SELECT r0 FROM cst) AS r FROM deg),
           |${(1 to 4).map(i =>
              s"""r$i AS MATERIALIZED (
                 |  SELECT sym.dst AS node,
                 |    (SELECT base FROM cst) + (85 * SUM(r${i - 1}.r // deg.deg)) // 100 AS r
                 |  FROM r${i - 1} JOIN sym ON r${i - 1}.node = sym.src
                 |  JOIN deg ON sym.src = deg.src
                 |  GROUP BY sym.dst)""".stripMargin).mkString(",\n")},
           |sc AS (
           |  SELECT ht.host, ht.tokens, CAST(r4.r AS BIGINT) AS rank,
           |    CAST((r4.r * 1000000) // ht.tokens AS BIGINT) AS ratio_ppm
           |  FROM ht JOIN r4 ON r4.node = ht.host),
           |cum AS (
           |  SELECT *, CAST(SUM(tokens) OVER (ORDER BY ratio_ppm DESC, host
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           |  FROM sc)
           |SELECT host, tokens, rank, ratio_ppm, cum_tokens
           |FROM cum
           |WHERE cum_tokens <= (SELECT CAST(SUM(tokens) // 2 AS BIGINT) FROM ht)
           |ORDER BY ratio_ppm DESC, host""".stripMargin),
    ),

    // Per-source self-redundancy: how much of each source is near-dup of
    // ITSELF (both pair members in the source) vs cross-source overlap
    // (q141's matrix diagonal, as a per-source curation signal) — the
    // "is this crawl scraping the same template repeatedly" report.
    QueryDef(
      "q237_source_redundancy",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents"))
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(d, "text", "doc_id", 0.5))
        val src = d.select(col("doc_id"), col("source"))
        val tagged = pairs
          .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
          .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
        val intra = tagged.where(col("sa") === col("sb"))
          .groupBy(col("sa").as("source"))
          .agg(count(lit(1)).as("n_intra_pairs"))
        val involved = tagged.where(col("sa") === col("sb"))
          .select(col("sa").as("source"), explode(array(col("a_id"), col("b_id")))
            .as("doc_id")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("docs_in_pairs"))
        d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .join(intra, Seq("source"), "left_outer")
          .join(involved, Seq("source"), "left_outer")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_intra_pairs"), lit(0L)).as("n_intra_pairs"),
            coalesce(col("docs_in_pairs"), lit(0L)).as("docs_in_pairs"),
            expr("(coalesce(docs_in_pairs, 0L) * 1000000) div n_docs")
              .as("redundancy_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS MATERIALIZED (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |tg AS MATERIALIZED (
             |  SELECT p.a_id, p.b_id, da.source AS sa, db.source AS sb
             |  FROM pairs p
             |  JOIN documents da ON da.doc_id = p.a_id
             |  JOIN documents db ON db.doc_id = p.b_id),
             |ip AS (SELECT sa AS source, COUNT(*) AS n_intra_pairs
             |       FROM tg WHERE sa = sb GROUP BY 1),
             |iv AS (
             |  SELECT source, COUNT(*) AS docs_in_pairs FROM (
             |    SELECT DISTINCT sa AS source, u.d AS doc_id
             |    FROM tg, unnest([a_id, b_id]) u(d) WHERE sa = sb)
             |  GROUP BY source),
             |n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
             |SELECT n.source, n.n_docs,
             |  COALESCE(ip.n_intra_pairs, 0) AS n_intra_pairs,
             |  COALESCE(iv.docs_in_pairs, 0) AS docs_in_pairs,
             |  CAST((COALESCE(iv.docs_in_pairs, 0) * 1000000) // n.n_docs AS BIGINT)
             |    AS redundancy_ppm
             |FROM n
             |LEFT JOIN ip ON ip.source = n.source
             |LEFT JOIN iv ON iv.source = n.source
             |ORDER BY n.source""".stripMargin),
    ),

    // Takedown-impact what-if: if the three token-heaviest hosts vanish
    // (legal takedown, robots change, dead site), how much of each
    // source's token mass goes with them? Broadcast top-k host set
    // against the per-(source, host) rollup — the resilience report a
    // crawl-dependent corpus needs before it happens.
    QueryDef(
      "q238_takedown_impact",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val byHost = PinnedCache.pin(d.select(col("source"),
            Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
              .as("host"),
            size(split(col("text"), " ")).cast("long").as("n_tok")))
        val top = byHost.groupBy(col("host")).agg(sum(col("n_tok")).as("ht"))
          .orderBy(col("ht").desc, col("host")).limit(3)
          .select(col("host"), lit(1).as("hit"))
        byHost.join(broadcast(top), Seq("host"), "left_outer")
          .groupBy(col("source"))
          .agg(sum(col("n_tok")).as("tokens"),
            sum(when(col("hit").isNotNull, col("n_tok")).otherwise(0L))
              .as("tokens_lost"))
          .select(col("source"), col("tokens"), col("tokens_lost"),
            expr("(tokens_lost * 1000000) div tokens").as("lost_ppm"))
          .orderBy(col("source"))
      },
      Some("WITH u AS (SELECT doc_id, " + Web.fixtureUrlSql +
        " AS url FROM documents),\n" + Web.canonicalizeSql + ",\n" +
        """bh AS MATERIALIZED (
          |  SELECT d.source, c.host,
          |    CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tok
          |  FROM documents d JOIN c ON c.doc_id = d.doc_id),
          |top AS (
          |  SELECT host FROM (
          |    SELECT host, SUM(n_tok) AS ht FROM bh GROUP BY host
          |    ORDER BY ht DESC, host LIMIT 3)),
          |a AS (
          |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens,
          |    CAST(SUM(CASE WHEN host IN (SELECT host FROM top)
          |                  THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_lost
          |  FROM bh GROUP BY source)
          |SELECT source, tokens, tokens_lost,
          |  CAST((tokens_lost * 1000000) // tokens AS BIGINT) AS lost_ppm
          |FROM a ORDER BY source""".stripMargin),
    ),

    // Rate periodicity: raw autocorrelation of hourly counts at the
    // daily (24 h) and weekly (168 h) lags, as exact integer
    // cross-products over the occupied-cell self-join (zero hours
    // contribute zero products, so the dense grid is never built) —
    // ρ(lag) = Σ c_h·c_{h+lag} / Σ c_h², the two doubles at the end.
    // High ρ(24) = diurnal schedule; ρ(168) ≫ ρ(24) = weekly batch jobs.
    QueryDef(
      "q239_periodicity",
      (s, dir) => {
        val occ = PinnedCache.pin(tbl(s, dir, "events")
          .select(col("event_type"), expr("ts div 3600000000000").as("hr"))
          .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("c")))
        def lagSum(lag: Int) = occ.as("a")
          .join(occ.select(col("event_type"),
            (col("hr") - lag).as("hr"), col("c").as("c2")).as("b"),
            Seq("event_type", "hr"))
          .groupBy(col("event_type"))
          .agg(sum(col("c") * col("c2")).as(s"s$lag"))
        occ.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"), sum(col("c") * col("c")).as("s0"))
          .join(lagSum(24), Seq("event_type"), "left_outer")
          .join(lagSum(168), Seq("event_type"), "left_outer")
          .select(col("event_type"), col("n_hours"), col("s0"),
            coalesce(col("s24"), lit(0L)).as("s24"),
            coalesce(col("s168"), lit(0L)).as("s168"))
          .select(col("event_type"), col("n_hours"), col("s0"), col("s24"),
            col("s168"),
            (col("s24").cast("double") / col("s0").cast("double")).as("rho_24"),
            (col("s168").cast("double") / col("s0").cast("double")).as("rho_168"))
          .orderBy(col("event_type"))
      },
      Some("""WITH occ AS MATERIALIZED (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |l24 AS (
             |  SELECT a.event_type, CAST(SUM(a.c * b.c) AS BIGINT) AS s24
             |  FROM occ a JOIN occ b
             |    ON b.event_type = a.event_type AND b.hr = a.hr + 24
             |  GROUP BY 1),
             |l168 AS (
             |  SELECT a.event_type, CAST(SUM(a.c * b.c) AS BIGINT) AS s168
             |  FROM occ a JOIN occ b
             |    ON b.event_type = a.event_type AND b.hr = a.hr + 168
             |  GROUP BY 1),
             |base AS (
             |  SELECT event_type, COUNT(*) AS n_hours,
             |    CAST(SUM(c * c) AS BIGINT) AS s0
             |  FROM occ GROUP BY 1)
             |SELECT base.event_type, base.n_hours, base.s0,
             |  COALESCE(l24.s24, 0) AS s24, COALESCE(l168.s168, 0) AS s168,
             |  CAST(COALESCE(l24.s24, 0) AS DOUBLE) / CAST(base.s0 AS DOUBLE) AS rho_24,
             |  CAST(COALESCE(l168.s168, 0) AS DOUBLE) / CAST(base.s0 AS DOUBLE) AS rho_168
             |FROM base
             |LEFT JOIN l24 ON l24.event_type = base.event_type
             |LEFT JOIN l168 ON l168.event_type = base.event_type
             |ORDER BY base.event_type""".stripMargin),
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

    // Dedup storage-savings projection: bytes (chars) reclaimed per
    // source if near-dup clusters collapse to their survivors — the
    // capacity-planning number that justifies running dedup at all.
    // Non-survivors from the q44 components; per-source char rollup
    // against the total.
    QueryDef(
      "q244_dedup_savings",
      (s, dir) => {
        val d = PinnedCache.pin(tbl(s, dir, "documents"))
        val cc = Dedup.connectedComponents(
          Dedup.jaccardPairs(d, "text", "doc_id", 0.5))
        val nonSurv = cc.where(col("id") =!= col("root"))
          .select(col("id").as("doc_id"))
        val saved = d.join(nonSurv, Seq("doc_id"), "left_semi")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("docs_removed"),
            sum(col("n_chars")).as("chars_saved"))
        d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
          .join(saved, Seq("source"), "left_outer")
          .select(col("source"), col("n_docs"), col("n_chars"),
            coalesce(col("docs_removed"), lit(0L)).as("docs_removed"),
            coalesce(col("chars_saved"), lit(0L)).as("chars_saved"),
            expr("(coalesce(chars_saved, 0L) * 1000000) div n_chars")
              .as("saved_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
             |          UNION SELECT b_id, a_id FROM pairs),
             |r(id, m) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m),
             |labels AS MATERIALIZED (SELECT id, MIN(m) AS root FROM r GROUP BY id),
             |sv AS (
             |  SELECT d.source, COUNT(*) AS docs_removed,
             |    CAST(SUM(d.n_chars) AS BIGINT) AS chars_saved
             |  FROM labels l JOIN documents d ON d.doc_id = l.id
             |  WHERE l.id <> l.root GROUP BY d.source),
             |n AS (SELECT source, COUNT(*) AS n_docs,
             |        CAST(SUM(n_chars) AS BIGINT) AS n_chars
             |      FROM documents GROUP BY source)
             |SELECT n.source, n.n_docs, n.n_chars,
             |  COALESCE(sv.docs_removed, 0) AS docs_removed,
             |  COALESCE(sv.chars_saved, 0) AS chars_saved,
             |  CAST((COALESCE(sv.chars_saved, 0) * 1000000) // n.n_chars AS BIGINT)
             |    AS saved_ppm
             |FROM n LEFT JOIN sv ON sv.source = n.source
             |ORDER BY n.source""".stripMargin),
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

    // Sorted-neighborhood dedup (SNM): the THIRD blocking family beside
    // LSH (q26) and prefix filtering (q104) — sort docs by a cheap key
    // (first two tokens), compare only within a window of w = 5 sorted
    // neighbors, verify with exact 3-shingle Jaccard. Classic
    // record-linkage blocking. Scale shape: the global rank is TWO-LEVEL
    // (per-key row_number — a partitioned window — plus a cumulative
    // offset whose global window runs only over the distinct-sort-key
    // ROLLUP, the house global-window rule), and the w-neighbor candidate
    // step is an EQUALITY hash join (each doc explodes its 5 successor
    // ranks; no rank-range nested loop). Emits verified pairs — missed
    // pairs are the method's documented trade-off (the oracle replicates
    // the SAME windowed semantics).
    QueryDef(
      "q246_sorted_neighborhood",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
        val keyed = d.select(col("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 2), " ").as("sk"))
        val offsets = keyed.groupBy("sk").agg(count(lit(1)).as("c"))
          .withColumn("off", coalesce(
            sum(col("c")).over(Window.orderBy(col("sk"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("sk", "off")
        val ranked = PinnedCache.pin(keyed.join(offsets, "sk")
          .select(col("doc_id"), (col("off") + row_number()
            .over(Window.partitionBy(col("sk")).orderBy(col("doc_id")))
            .cast("long")).as("rk")))
        val cand = ranked
          .select(col("doc_id").as("a_id"),
            explode(sequence(col("rk") + 1, col("rk") + 5)).as("rkb"))
          .join(ranked.select(col("doc_id").as("b_id"), col("rk").as("rkb")), "rkb")
          .select(col("a_id"), col("b_id"))
        val sh = Dedup.hashedShingleSets(d, "text", "doc_id")
          .select(col("doc_id"), col("s"))
        cand
          .join(sh.select(col("doc_id").as("a_id"), col("s").as("sa")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("s").as("sb")), "b_id")
          .select(col("a_id"), col("b_id"),
            expr("size(array_intersect(sa, sb))").cast("long").as("inter"),
            expr("size(sa) + size(sb) - size(array_intersect(sa, sb))")
              .cast("long").as("uni"))
          .where(col("inter") * 2 >= col("uni"))
          .select(least(col("a_id"), col("b_id")).as("a_id"),
            greatest(col("a_id"), col("b_id")).as("b_id"),
            expr("(inter * 1000000) div uni").as("jaccard_ppm"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH k AS (
             |  SELECT doc_id,
             |    array_to_string(string_split(text,' ')[1:2], ' ') AS sk
             |  FROM documents),
             |rk AS MATERIALIZED (
             |  SELECT doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS BIGINT) AS rk
             |  FROM k),
             |cand AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM rk a JOIN rk b ON b.rk > a.rk AND b.rk <= a.rk + 5),
             |sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |v AS (
             |  SELECT c.a_id, c.b_id,
             |    CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
             |    CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS BIGINT) AS uni
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.a_id
             |  JOIN sh sb ON sb.doc_id = c.b_id)
             |SELECT LEAST(a_id, b_id) AS a_id, GREATEST(a_id, b_id) AS b_id,
             |  CAST((inter * 1000000) // uni AS BIGINT) AS jaccard_ppm
             |FROM v WHERE inter * 2 >= uni
             |ORDER BY a_id, b_id""".stripMargin),
    ),

    // TF-IDF weighted-cosine re-rank of the near-dup pairs: set-level
    // Jaccard (q26's pipeline) finds the pairs; this scores each with a
    // WEIGHTED vector measure — integer tf-idf weights wt = tf·(N div df)
    // (the q77 log-free idf, floored to keep both engines integer-exact),
    // reported as cos²·10⁶ so no sqrt is needed: cos²_ppm
    // = dot²·10⁶ div (‖a‖²·‖b‖²). The squared products ride decimal(38,0)
    // (HUGEINT in the oracle); exact while per-doc ‖·‖² < 10^16 — holds at
    // every gate sf, decimal-everywhere documented past it. Shape: one
    // (doc,term) count, one vocab-sized df join, pair-keyed dot products
    // over the CANDIDATE pairs only (never corpus²). Scales.
    QueryDef(
      "q247_tfidf_cosine_rerank",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(d, "text", "doc_id", 0.5)
          .select(col("a_id"), col("b_id"))
        val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfreq = tok.distinct().groupBy("w").agg(count(lit(1)).as("df"))
        val total = d.groupBy().agg(count(lit(1)).as("n_docs"))
        val wts = PinnedCache.pin(tf.join(dfreq, "w").crossJoin(broadcast(total))
          .select(col("doc_id"), col("w"),
            (col("tf") * expr("n_docs div df")).as("wt")))
        val norms = wts.groupBy("doc_id").agg(sum(col("wt") * col("wt")).as("n2"))
        val dots = pairs
          .join(wts.select(col("doc_id").as("a_id"), col("w"), col("wt").as("wa")), "a_id")
          .join(wts.select(col("doc_id").as("b_id"), col("w"), col("wt").as("wb")),
            Seq("b_id", "w"))
          .groupBy("a_id", "b_id").agg(sum(col("wa") * col("wb")).as("dot"))
        dots
          .join(norms.select(col("doc_id").as("a_id"), col("n2").as("na")), "a_id")
          .join(norms.select(col("doc_id").as("b_id"), col("n2").as("nb")), "b_id")
          .select(col("a_id"), col("b_id"),
            expr("cast((cast(dot as decimal(38,0)) * dot * 1000000) div " +
              "(cast(na as decimal(38,0)) * nb) as bigint)").as("cos2_ppm"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |tf AS (SELECT doc_id, w, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1,2),
             |dfreq AS (SELECT w, COUNT(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
             |n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
             |wts AS MATERIALIZED (
             |  SELECT doc_id, w, tf * (n_docs // df) AS wt
             |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
             |norms AS (SELECT doc_id, CAST(SUM(wt*wt) AS BIGINT) AS n2
             |          FROM wts GROUP BY 1),
             |dots AS (SELECT p.a_id, p.b_id, CAST(SUM(wa.wt * wb.wt) AS BIGINT) AS dot
             |         FROM pairs p
             |         JOIN wts wa ON wa.doc_id = p.a_id
             |         JOIN wts wb ON wb.doc_id = p.b_id AND wb.w = wa.w
             |         GROUP BY 1,2)
             |SELECT d.a_id, d.b_id,
             |  CAST((d.dot::HUGEINT * d.dot * 1000000) // (na.n2::HUGEINT * nb.n2)
             |       AS BIGINT) AS cos2_ppm
             |FROM dots d
             |JOIN norms na ON na.doc_id = d.a_id
             |JOIN norms nb ON nb.doc_id = d.b_id
             |ORDER BY a_id, b_id""".stripMargin),
    ),

    // Winnowing fingerprint overlap (MOSS): the FOURTH candidate-blocking
    // family beside LSH (q26), prefix filtering (q104) and sorted
    // neighborhoods (q246) — and the only one with a positional-coverage
    // guarantee (any shared run of >= w+k-1 words yields a shared
    // fingerprint). See Dedup.winnowingFingerprints for the
    // rightmost-min-as-one-integer-MIN encoding; the >50-doc fingerprint
    // stoplist bounds join fan-out while keeping shared counts exact.
    QueryDef(
      "q248_winnowing_overlap",
      (s, dir) => {
        val fps = Dedup.winnowingFingerprints(
          tbl(s, dir, "documents"), "text", "doc_id", k = 4, w = 4)
        Dedup.winnowingOverlapPairs(fps, maxDocFreq = 50, minShared = 2L)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |grams AS (
             |  SELECT doc_id, i - 1 AS j, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
             |  FROM toks, unnest(generate_series(1, len(t) - 3)) u(i)),
             |hashed AS (
             |  SELECT doc_id, j,
             |    (CAST(('0x'||substring(md5(g),1,15)) AS BIGINT) % 1099511627776)
             |      * 1048576 + (1048575 - j) AS c
             |  FROM grams),
             |selraw AS (
             |  SELECT doc_id, j,
             |    MIN(c) OVER (PARTITION BY doc_id ORDER BY j
             |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cmin,
             |    COUNT(*) OVER (PARTITION BY doc_id) AS gc
             |  FROM hashed),
             |fps AS (
             |  SELECT DISTINCT doc_id, cmin // 1048576 AS fp
             |  FROM selraw WHERE j <= gc - 4),
             |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50),
             |f AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp))
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*)::BIGINT AS shared
             |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2
             |ORDER BY a_id, b_id""".stripMargin),
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

    // Multi-window multi-burn SLO alerting (SRE workbook): error share
    // over 6h and 24h trailing windows; alert only when the short window
    // burns >= 1.10x AND the long window >= 1.03x of the 20% error
    // budget — fast detection with a blip veto. Windows run over the
    // hourly ROLLUP only. See EventFunnel.sloBurnRate.
    QueryDef(
      "q251_slo_burn_rate",
      (s, dir) => EventFunnel.sloBurnRate(tbl(s, dir, "events"),
          epochNs = 1704067200000000000L, errType = "error",
          budgetPpm = 200000L, shortW = 6, longW = 24,
          fastCenti = 110L, slowCenti = 103L)
        .orderBy(col("hr")),
      Some("""WITH c AS (
             |  SELECT (epoch_ns(ts) - 1704067200000000000) // 3600000000000 AS hr,
             |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err,
             |    COUNT(*)::BIGINT AS tot
             |  FROM events GROUP BY 1),
             |w AS (
             |  SELECT hr, err, tot,
             |    CAST(SUM(err) OVER (ORDER BY hr RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS err_s,
             |    CAST(SUM(tot) OVER (ORDER BY hr RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS tot_s,
             |    CAST(SUM(err) OVER (ORDER BY hr RANGE BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS err_l,
             |    CAST(SUM(tot) OVER (ORDER BY hr RANGE BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS tot_l
             |  FROM c),
             |f AS (
             |  SELECT hr, err, tot,
             |    (err_s * 1000000) // tot_s AS share_s_ppm,
             |    (err_l * 1000000) // tot_l AS share_l_ppm
             |  FROM w)
             |SELECT hr, err, tot, share_s_ppm, share_l_ppm,
             |  (share_s_ppm * 100) // 200000 AS burn_s_centi,
             |  (share_l_ppm * 100) // 200000 AS burn_l_centi,
             |  ((share_s_ppm * 100) // 200000 >= 110
             |   AND (share_l_ppm * 100) // 200000 >= 103) AS alert
             |FROM f ORDER BY hr""".stripMargin),
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

    // INCREMENTAL label-propagation communities (q183's maintained form,
    // the q164 discipline for the mesoscale): co-purchase edges split
    // into base and delta waves; the base graph's final labels fold the
    // delta in via bounded re-propagation on the touched ball only
    // (Graphs.incrementalLabelPropagation — 2R−1-hop BFS ball + the same
    // argmin recurrence restricted to ball-incident edges). The oracle is
    // ONE-SHOT batch LPA over ALL edges, so a pass proves incremental ≡
    // recompute; IncrementalLpaSpec adds random-wave, bridge-merge, and
    // dag-cycle cases.
    QueryDef(
      "q253_incremental_lpa",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = PinnedCache.pin(li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct())
        val base = edges.where((col("a") + col("b")) % 2 === 0)
        val delta = edges.where((col("a") + col("b")) % 2 === 1)
        Graphs.incrementalLabelPropagation(
            Graphs.labelPropagation(base, rounds = 2), base, delta, rounds = 2)
          .withColumnRenamed("lab", "label")
          .orderBy(col("node"))
      },
      Some({
        val round = (i: Int) =>
          s"""n$i AS (
             |  SELECT sym.b AS node, l${i - 1}.lab, COUNT(*) AS c
             |  FROM l${i - 1} JOIN sym ON sym.a = l${i - 1}.node GROUP BY 1, 2),
             |l$i AS (
             |  SELECT node, lab FROM (
             |    SELECT node, lab,
             |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
             |    FROM n$i) WHERE rn = 1)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           |           FROM lineitem a JOIN lineitem b
           |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
           |l0 AS (SELECT DISTINCT a AS node, a AS lab FROM sym),
           |${(1 to 2).map(round).mkString(",\n")}
           |SELECT node, lab AS label FROM l2 ORDER BY node""".stripMargin
      }),
    ),
  )
}
