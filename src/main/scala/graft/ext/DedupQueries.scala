package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Deduplication family (CATALOG.md 'Dedup'): exact/LSH/SimHash near-dup, survivors, clusters, span/prefix joins, recall audits, incremental maintenance.
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object DedupQueries {

  def queries: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on the full value, min-id survivor.
    QueryDef(
      "q24_dedup_exact",
      (s, dir) => Dedup.exactDedupStats(tbl(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("keep_id")),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt FROM documents
             |GROUP BY text ORDER BY keep_id""".stripMargin),
    ),


    // Fingerprint: md5 identical across engines.
    QueryDef(
      "q25_fingerprint",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"),
    ),


    // Near-dup via MinHash-LSH banding + exact 3-shingle Jaccard verify;
    // oracle is the brute-force O(n^2) pair scan.
    QueryDef(
      "q26_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
        .orderBy(col("a_id"), col("b_id")),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |      / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
             |ORDER BY a_id, b_id""".stripMargin),
    ),


    // 16-bit SimHash per document (portable md5-derived token hashes).
    QueryDef(
      "q27_simhash",
      (s, dir) => tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.simhash16("text").as("simhash"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  list_sum([CASE WHEN list_sum([CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END
             |                                FOR h IN hashes]) > 0
             |            THEN (1::BIGINT << i) ELSE 0 END
             |            FOR i IN generate_series(0, 15)])::BIGINT AS simhash
             |FROM (SELECT doc_id,
             |        [CAST(('0x' || substring(md5(t),1,15)) AS BIGINT)
             |         FOR t IN list_distinct(string_split(text,' '))] AS hashes
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),


    // Near-dup CLUSTERS: LSH pairs -> connected components (min-label
    // propagation) -> one row per multi-member cluster. The principled
    // survivor rule (pair-wise drops are not transitive); oracle computes
    // the same components with a recursive CTE.
    QueryDef(
      "q44_neardup_clusters",
      (s, dir) => Dedup.nearDupClusters(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
        .orderBy(col("root_id")),
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
             |labels AS (SELECT id, MIN(m) AS root_id FROM r GROUP BY id)
             |SELECT root_id, COUNT(*) AS members FROM labels
             |GROUP BY root_id ORDER BY root_id""".stripMargin),
    ),


    // SimHash near-dup pairs in hamming space: 60-bit signatures, 4-band
    // blocking (recall 1.0 for dist <= 3 by pigeonhole, so the brute-force
    // oracle matches EXACTLY), bit_count verify. The hamming-space sibling
    // of q26's MinHash-LSH — one signature scan, one (band, slice)-keyed
    // self-join, no all-pairs anywhere.
    QueryDef(
      "q63_simhash_neardup",
      (s, dir) => Dedup.simhashNearDupPairs(tbl(s, dir, "documents"),
          "text", "doc_id", bits = 60, bands = 4, maxDist = 3)
        .orderBy(col("a_id"), col("b_id")),
      Some("""WITH sig AS (
             |  SELECT doc_id,
             |    list_sum([CASE WHEN list_sum([CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END
             |                                  FOR h IN hashes]) > 0
             |              THEN (1::BIGINT << i) ELSE 0 END
             |              FOR i IN generate_series(0, 59)])::BIGINT AS sig
             |  FROM (SELECT doc_id,
             |          [CAST(('0x' || substring(md5(t),1,15)) AS BIGINT)
             |           FOR t IN list_distinct(string_split(text,' '))] AS hashes
             |        FROM documents))
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sig, b.sig)) <= 3
             |ORDER BY a_id, b_id""".stripMargin),
    ),


    // The SKEW-SAFE last-by-key (two-stage salted aggregation) as a
    // first-class query: same oracle as the plain path — salting must be
    // invisible in results. A hot key's rows split across salt buckets
    // map-side, so no single reducer sees the whole key.
    QueryDef(
      "q69_lastby_salted",
      (s, dir) => graft.tables.TableOps.lastByKeysSalted(
          tbl(s, dir, "events"), Seq("user_id"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type"), col("value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id AS last_event_id, event_type, value FROM (
             |SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
    ),


    // Incremental near-dup: new docs (source != src0) vs the existing
    // corpus (src0) — the nightly-ingest dedup shape. Band join is
    // new x corpus, never corpus x corpus; oracle is the brute-force
    // cross scan.
    QueryDef(
      "q70_incremental_neardup",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Dedup.incrementalNearDups(
            docs.where(col("source") =!= "src0"),
            docs.where(col("source") === "src0"),
            "text", "doc_id", 0.5)
          .orderBy(col("new_id"), col("corpus_id"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, source,
             |    list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                   FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, source, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3)
             |SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
             |  ROUND(CAST(len(list_intersect(n.s,c.s)) AS DOUBLE)
             |        / (len(n.s)+len(c.s)-len(list_intersect(n.s,c.s))), 6) AS jaccard
             |FROM sh n JOIN sh c ON n.source != 'src0' AND c.source = 'src0'
             |WHERE CAST(len(list_intersect(n.s,c.s)) AS DOUBLE)
             |      / (len(n.s)+len(c.s)-len(list_intersect(n.s,c.s))) >= 0.5
             |ORDER BY new_id, corpus_id""".stripMargin),
    ),


    // Survivor selection per near-dup cluster with a production preference:
    // keep the LONGEST member (tiebreak lowest id) instead of min-id —
    // the preference changes only the survivor, never the clustering.
    QueryDef(
      "q72_cluster_survivors",
      (s, dir) => Dedup.clusterSurvivors(tbl(s, dir, "documents"), "text", "doc_id",
          struct(col("n_chars"), (-col("doc_id")).as("nid")), 0.5)
        .orderBy(col("root_id")),
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
             |labels AS (SELECT id, MIN(m) AS root_id FROM r GROUP BY id),
             |surv AS (
             |  SELECT l.root_id, d.doc_id,
             |    row_number() OVER (PARTITION BY l.root_id
             |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
             |  FROM labels l JOIN documents d ON d.doc_id = l.id)
             |SELECT root_id, MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
             |  COUNT(*) AS members
             |FROM surv GROUP BY root_id ORDER BY root_id""".stripMargin),
    ),


    // Cross-source duplication matrix: near-dup pairs rolled up by source
    // pair — which crawls duplicate which. One tiny join of the pair list
    // back to the (id, source) projection per side. Oracle note: like q26,
    // the oracle is the brute-force exact pair scan and the Spark side is
    // LSH-pruned — recall at J >= 0.5 with r=2/b=32 banding is
    // 1-(1-J^2)^32 >= 0.9999 (see Dedup.jaccardPairs), so agreement relies
    // on that bound rather than a bucketed-oracle replication.
    QueryDef(
      "q75_source_dup_matrix",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
          .join(src.select(col("doc_id").as("a_id"), col("source").as("source_a")), "a_id")
          .join(src.select(col("doc_id").as("b_id"), col("source").as("source_b")), "b_id")
          // normalize the pair orientation so (src0, src1) == (src1, src0)
          .select(least(col("source_a"), col("source_b")).as("src_lo"),
            greatest(col("source_a"), col("source_b")).as("src_hi"))
          .groupBy(col("src_lo"), col("src_hi"))
          .agg(count(lit(1)).as("dup_pairs"))
          .orderBy(col("src_lo"), col("src_hi"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, source,
             |    list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                   FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, source, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3),
             |p AS (
             |  SELECT LEAST(a.source, b.source) AS src_lo,
             |         GREATEST(a.source, b.source) AS src_hi
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5)
             |SELECT src_lo, src_hi, COUNT(*) AS dup_pairs
             |FROM p GROUP BY src_lo, src_hi ORDER BY src_lo, src_hi""".stripMargin),
    ),


    // The hot-bucket guard's AUDIT surface as a first-class query: RHP
    // bucket occupancy above the cap (size, hub). Fully deterministic
    // (plane literals), so the skew diagnosis itself is oracle-checked.
    QueryDef(
      "q96_lsh_bucket_audit",
      (s, dir) => Dedup.oversizedBuckets(
          Similarity.rhpBuckets(tbl(s, dir, "embeddings"), "embedding", "vec_id",
            LshTables, LshBits),
          Seq("tbl", "sig"), "id", GuardCap)
        .orderBy(col("tbl"), col("sig")),
      Some(s"""WITH $sigCtesSql
              |SELECT CAST(tbl AS INTEGER) AS tbl, CAST(sig AS BIGINT) AS sig,
              |  COUNT(*) AS bucket_size, MIN(vec_id) AS hub_id
              |FROM sig GROUP BY tbl, sig HAVING COUNT(*) > $GuardCap
              |ORDER BY tbl, sig""".stripMargin),
    ),


    // The guard's DEGRADED SEMANTICS under oracle: near-dup pairs with a
    // cap that actually fires on this corpus (RHP bits=5 buckets hold
    // ~|corpus|/32 vectors per table). The oracle replicates the hub rule
    // exactly — members of small buckets pair freely, oversized buckets
    // contribute only (hub, member) pairs — proving the guarded pipeline
    // is deterministic and engine-independent, not a Spark-side heuristic.
    QueryDef(
      "q97_guarded_neardup",
      (s, dir) => Similarity.cosineNearDupPairsLsh(
          tbl(s, dir, "embeddings"), "embedding", "vec_id", 0.4,
          LshTables, LshBits, maxBucketSize = GuardCap)
        .orderBy(col("a_id"), col("b_id")),
      Some(s"""WITH $sigCtesSql,
              |bstat AS (
              |  SELECT tbl, sig, COUNT(*) AS cnt, MIN(vec_id) AS hub
              |  FROM sig GROUP BY tbl, sig),
              |cand AS (
              |  SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
              |  FROM sig l
              |  JOIN bstat s ON l.tbl = s.tbl AND l.sig = s.sig
              |  JOIN sig r ON r.tbl = l.tbl AND r.sig = l.sig AND l.vec_id < r.vec_id
              |  WHERE s.cnt <= $GuardCap OR l.vec_id = s.hub),
              |$verifyCtesSql
              |SELECT a_id, b_id, cos_sim FROM verified
              |ORDER BY a_id, b_id""".stripMargin),
    ),


    // EXACT set-similarity join via prefix filtering (AllPairs/PPJoin
    // family): q26's pair list with provably NO miss rate — same 3-shingle
    // sets, same threshold, but candidates come from each doc's
    // rarest-shingle prefix instead of LSH bands, so completeness is the
    // prefix lemma, not a 1-(1-J^2)^32 recall bound. Any oracle mismatch
    // is a bug, not bad luck. (Shingle granularity keeps the pair list
    // sparse; token-set granularity on this template corpus is
    // output-quadratic — see containmentPairs' doc.)
    QueryDef(
      "q104_prefix_jaccard_join",
      (s, dir) => Dedup.prefixJaccardPairs(
          tbl(s, dir, "documents"), "text", "doc_id", 0.5, k = 3)
        .orderBy(col("a_id"), col("b_id")),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS tokens FROM documents)
             |  WHERE len(tokens) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |      / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5
             |ORDER BY a_id, b_id""".stripMargin),
    ),


    // SemDeDup: cluster embeddings (deterministic lowest-id centroids, the
    // q43 machinery), drop within-cluster near-duplicates keeping the
    // member farthest from its centroid. Fully deterministic given the
    // centroid set, so the oracle replicates assignment (argmax + cid
    // tie-break), keep order, and the dominance rule exactly.
    QueryDef(
      "q106_semdedup",
      (s, dir) => Similarity.semDeDup(
          tbl(s, dir, "embeddings"), "embedding", "vec_id", eps = 0.4,
          numCentroids = 16)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id")),
      Some("""WITH n AS (
             |  SELECT vec_id, embedding,
             |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
             |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
             |  FROM embeddings),
             |cents AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
             |assign AS (
             |  SELECT vec_id, cid, csim AS ccos FROM (
             |    SELECT x.vec_id, c.cid,
             |      (list_sum([CAST(x.embedding[i] AS DOUBLE)*c.cv[i]
             |                 FOR i IN generate_series(1,len(x.embedding))])/(x.nrm*c.cnrm)) AS csim,
             |      ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
             |        (list_sum([CAST(x.embedding[i] AS DOUBLE)*c.cv[i]
             |                   FOR i IN generate_series(1,len(x.embedding))])/(x.nrm*c.cnrm)) DESC,
             |        c.cid) AS crk
             |    FROM n x CROSS JOIN cents c) WHERE crk = 1),
             |rem AS (
             |  SELECT DISTINCT ax.vec_id
             |  FROM assign ax
             |  JOIN n x ON x.vec_id = ax.vec_id
             |  JOIN assign ay ON ay.cid = ax.cid AND ay.vec_id != ax.vec_id
             |  JOIN n y ON y.vec_id = ay.vec_id
             |  WHERE (ay.ccos < ax.ccos OR (ay.ccos = ax.ccos AND ay.vec_id < ax.vec_id))
             |    AND list_sum([CAST(x.embedding[i] AS DOUBLE)*y.embedding[i]
             |                  FOR i IN generate_series(1,len(x.embedding))])/(x.nrm*y.nrm) >= 0.4)
             |SELECT a.vec_id, a.cid, a.ccos,
             |  a.vec_id NOT IN (SELECT vec_id FROM rem) AS kept
             |FROM assign a ORDER BY a.vec_id""".stripMargin),
    ),


    // CCNet's keep rule as a composition: per-SOURCE quantile cut of the
    // q105 surprisal, on a 1/16-bit integer grid (integer division + the
    // q103 ceil-rank extraction) — head and tail of each source's
    // distribution dropped, decisions bit-exact across engines.
    QueryDef(
      "q107_ccnet_band_filter",
      (s, dir) => Curation.surprisalBandFilter(
          tbl(s, dir, "documents"), "text", "doc_id", "source")
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
             |  FROM (SELECT COUNT(*) AS nt FROM tok)),
             |d AS (
             |  SELECT t.doc_id, COUNT(*) AS n,
             |    CAST(SUM(nq.qn - f.ql) AS BIGINT) AS bits_q4
             |  FROM tok t JOIN tfq f USING (w), nq GROUP BY t.doc_id),
             |s AS (
             |  SELECT d.doc_id, doc.source, (bits_q4 * 64) // (n * 4) AS bin
             |  FROM d JOIN documents doc USING (doc_id)),
             |b AS (SELECT source, bin, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
             |c AS (
             |  SELECT source, bin, cnt,
             |    SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
             |    SUM(cnt) OVER (PARTITION BY source) AS n
             |  FROM b),
             |cuts AS (
             |  SELECT source,
             |    MIN(CASE WHEN cum >= (n * 25 + 99) // 100 THEN bin END) AS b_lo,
             |    MIN(CASE WHEN cum >= (n * 75 + 99) // 100 THEN bin END) AS b_hi
             |  FROM c GROUP BY source)
             |SELECT s.doc_id, s.source, s.bin,
             |  s.bin BETWEEN cuts.b_lo AND cuts.b_hi AS keep
             |FROM s JOIN cuts USING (source) ORDER BY s.doc_id""".stripMargin),
    ),


    // Exact subset-containment (|A∩B|/|A| = 1.0), probe-vs-corpus: is any
    // "benchmark" doc (every 50th) token-contained in a corpus doc — the
    // asymmetric leak Jaccard misses. Candidates = share the probe doc's
    // single rarest token under CORPUS frequencies (the t=1.0 prefix);
    // oracle = brute-force asymmetric scan, exact by the prefix lemma.
    QueryDef(
      "q109_subset_containment",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        Dedup.containmentPairs(
            docs.where(col("doc_id") % 50 === 0), docs, "text", "doc_id", 1.0)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id, list_distinct(string_split(text,' ')) AS s
             |  FROM documents)
             |SELECT a_id, b_id, ROUND(c, 6) AS containment FROM (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)/len(a.s) AS c
             |  FROM s a JOIN s b ON a.doc_id != b.doc_id
             |  WHERE a.doc_id % 50 = 0)
             |WHERE c >= 1.0 ORDER BY a_id, b_id""".stripMargin),
    ),


    // Host-level dedup rollup: per canonical host, doc counts and the
    // share of docs that are exact-dup LOSERS corpus-wide (q24's min-id
    // survivor rule) — the "which hosts ship boilerplate" report joined
    // from the canonicalizer. One host-keyed aggregate after the dup flag
    // join; at 100 TB the text-min join is the q24 shuffle, the host
    // rollup is metadata-sized.
    QueryDef(
      "q120_host_dedup_rollup",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val hosts = d.select(col("doc_id"), col("text"),
          Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang"))).as("host"))
        val survivors = d.groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
        hosts.join(survivors, "text")
          .groupBy(col("host"))
          .agg(count(lit(1)).as("docs"),
            sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L)).as("dup_docs"),
            (sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L)).cast("double") /
              count(lit(1))).as("dup_share"))
          .orderBy(col("host"))
      },
      Some("WITH u AS (SELECT doc_id, " + Web.fixtureUrlSql +
        " AS url FROM documents),\n" + Web.canonicalizeSql + ",\n" +
        """d AS (SELECT c.doc_id, c.host, doc.text
          |      FROM c JOIN documents doc ON c.doc_id = doc.doc_id),
          |m AS (SELECT text, MIN(doc_id) AS keep_id FROM documents GROUP BY text)
          |SELECT d.host, COUNT(*) AS docs,
          |  CAST(SUM(CASE WHEN d.doc_id <> m.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
          |  CAST(SUM(CASE WHEN d.doc_id <> m.keep_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
          |    AS dup_share
          |FROM d JOIN m ON d.text = m.text
          |GROUP BY d.host ORDER BY d.host""".stripMargin),
    ),


    // Exact repeated-SPAN dedup profile (Lee et al. 2022): every 8-token
    // sliding span fingerprinted, spans occurring >= 2x corpus-wide
    // flagged, per-doc maximal duplicated regions merged and their token
    // coverage reported. Catches boilerplate passages inside otherwise
    // unique docs — invisible to the doc-level family (q24/q26/q63).
    // Map-only span generation; shuffles are the span-hash groupBy
    // (partial-agg), one semi join, one per-doc window. Oracle replicates
    // the portable md5-60bit span hash so grouping is bit-identical.
    QueryDef(
      "q127_span_dedup",
      (s, dir) => Dedup.spanDupProfile(tbl(s, dir, "documents"),
          "text", "doc_id", k = 8)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |s AS (SELECT doc_id, unnest(generate_series(1, len(toks)-8+1)) AS pos, toks
             |      FROM t WHERE len(toks) >= 8),
             |sp AS (SELECT doc_id, pos - 1 AS pos,
             |         CAST(('0x' || substring(md5(array_to_string(toks[pos:pos+7],' ')),1,15)) AS BIGINT) AS h
             |       FROM s),
             |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2),
             |f AS (SELECT doc_id, pos FROM sp SEMI JOIN dup USING (h)),
             |g AS (SELECT doc_id, pos,
             |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
             |             THEN 0 ELSE 1 END AS brk
             |      FROM f),
             |r AS (SELECT doc_id, pos,
             |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS rid
             |      FROM g),
             |reg AS (SELECT doc_id, rid, COUNT(*) AS spans, MAX(pos) - MIN(pos) + 8 AS covered
             |        FROM r GROUP BY doc_id, rid),
             |agg AS (SELECT doc_id, CAST(SUM(spans) AS BIGINT) AS dup_spans,
             |          CAST(COUNT(*) AS BIGINT) AS dup_regions,
             |          CAST(SUM(covered) AS BIGINT) AS dup_tokens
             |        FROM reg GROUP BY doc_id)
             |SELECT d.doc_id, CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
             |  COALESCE(a.dup_spans, 0) AS dup_spans,
             |  COALESCE(a.dup_regions, 0) AS dup_regions,
             |  COALESCE(a.dup_tokens, 0) AS dup_tokens,
             |  CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / len(string_split(d.text,' ')) AS dup_frac
             |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin),
    ),


    // PassJoin-blocked Levenshtein similarity self-join on part names —
    // the exact fuzzy-matching primitive for entity resolution. Runs on
    // the exact-dedup'd DISTINCT strings with group counts (2000 rows ->
    // 64 names here; the realistic shape at any scale), generates
    // candidates via d+1-segment blocking (complete by pigeonhole — see
    // EditDistance's exactness argument + brute-force spec), verifies
    // with codegen'd levenshtein. The oracle IS the brute force: any
    // missing pair is a blocking bug.
    QueryDef(
      "q128_lev_join",
      (s, dir) => EditDistance.levSimilarityJoin(tbl(s, dir, "part"), "p_name", d = 2)
        .orderBy(col("a_name"), col("b_name")),
      Some("""WITH names AS (
             |  SELECT p_name AS name, COUNT(*) AS cnt FROM part
             |  WHERE len(p_name) >= 3 GROUP BY 1)
             |SELECT a.name AS a_name, b.name AS b_name,
             |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
             |  a.cnt AS a_cnt, b.cnt AS b_cnt
             |FROM names a JOIN names b ON a.name < b.name
             |WHERE levenshtein(a.name, b.name) <= 2
             |ORDER BY a_name, b_name""".stripMargin),
    ),


    // Span NOVELTY in corpus order — q127's keep/drop side: a span is
    // novel iff no equal span occurred earlier in (doc_id, pos) order
    // (Lee et al. keep-first-occurrence). One window over span-hash
    // partitions (groups bounded by occurrence counts, no global sort);
    // the transformWithState twin reconciles exactly.
    QueryDef(
      "q129_span_novelty",
      (s, dir) => Dedup.spanNoveltyProfile(tbl(s, dir, "documents"),
          "text", "doc_id", k = 8)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |s AS (SELECT doc_id, unnest(generate_series(1, len(toks)-8+1)) AS pos, toks
             |      FROM t WHERE len(toks) >= 8),
             |sp AS (SELECT doc_id, pos - 1 AS pos,
             |         CAST(('0x' || substring(md5(array_to_string(toks[pos:pos+7],' ')),1,15)) AS BIGINT) AS h
             |       FROM s),
             |rn AS (SELECT doc_id,
             |         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
             |       FROM sp),
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             |          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_spans
             |        FROM rn GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(a.n_spans, 0) AS n_spans,
             |  COALESCE(a.novel_spans, 0) AS novel_spans,
             |  COALESCE(a.n_spans, 0) - COALESCE(a.novel_spans, 0) AS seen_before
             |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin),
    ),


    // MinHash band-config recall audit: per Jaccard decile, the fraction
    // of TRUE >=0.5 token-set pairs the (16 hashes, r=2) banded candidate
    // stage surfaces — measured against the exact prefix-filter pair list
    // on the audit corpus. Non-degenerate here (recall climbs 0.89 -> 1.0
    // across deciles 5..9, tracking 1-(1-J^2)^8). Portable md5 minhash
    // family so the oracle replays candidate generation bit-for-bit;
    // decile/recall arithmetic is integer.
    QueryDef(
      "q143_lsh_recall_audit",
      (s, dir) => Dedup.lshRecallAudit(tbl(s, dir, "documents"),
          "text", "doc_id", threshold = 0.5, k = 1, numHashes = 16, r = 2,
          sampleNum = 1, sampleDenom = 10)
        .orderBy(col("decile")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text,' ') AS tokens FROM documents
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
             |             AS BIGINT) % 10 < 1),
             |sh AS (SELECT doc_id, list_distinct(tokens) AS s FROM t WHERE len(tokens) >= 1),
             |exact AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |gs AS (SELECT doc_id, unnest(s) AS g FROM sh),
             |m AS (
             |  SELECT doc_id, i,
             |    MIN(CAST(('0x' || substring(md5(g || ':' || i),1,15)) AS BIGINT)) AS mh
             |  FROM gs, unnest(generate_series(0, 15)) t(i)
             |  GROUP BY doc_id, i),
             |bk AS (
             |  SELECT a.doc_id, a.i // 2 AS band, a.mh AS m1, b.mh AS m2
             |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND b.i = a.i + 1 AND a.i % 2 = 0),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             |  FROM bk x JOIN bk y
             |    ON x.band = y.band AND x.m1 = y.m1 AND x.m2 = y.m2
             |    AND x.doc_id < y.doc_id),
             |j AS (
             |  SELECT e.jaccard, (c.a_id IS NOT NULL) AS found
             |  FROM exact e LEFT JOIN cand c ON e.a_id = c.a_id AND e.b_id = c.b_id)
             |SELECT LEAST(9, CAST(floor(jaccard*10) AS BIGINT)) AS decile,
             |  COUNT(*) AS n_pairs,
             |  CAST(SUM(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
             |  (CAST(SUM(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             |    // COUNT(*) AS recall_ppm
             |FROM j GROUP BY 1 ORDER BY decile""".stripMargin),
    ),


    // INCREMENTAL connected components over the near-dup graph: the edge
    // list splits into a base wave and a delta wave (parity of the pair
    // sum — any deterministic split works); the delta is folded into the
    // base labels via star-contraction + CC on the touched-plus-delta
    // subgraph only. The oracle is ONE-SHOT batch CC over all pairs
    // (q44's recursive CTE emitting labels), so a pass proves the
    // incremental maintenance is indistinguishable from recomputation —
    // the nightly-crawl dup-graph contract (IncrementalCcSpec adds the
    // dag-cycle and merge/new-node cases).
    QueryDef(
      "q164_incremental_cc",
      (s, dir) => {
        // Pin the shared LSH pair pipeline BEFORE the base/delta split:
        // both branches (and connectedComponents' internal checkpoint on
        // the base side only) would otherwise each re-run jaccardPairs —
        // the exact shared-subtree hazard PinnedCache exists for.
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id")))
        val base = pairs.where((col("a_id") + col("b_id")) % 2 === 0)
        val delta = pairs.where((col("a_id") + col("b_id")) % 2 === 1)
        Dedup.incrementalConnectedComponents(
            Dedup.connectedComponents(base), delta)
          .orderBy(col("id"))
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
             |  SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.m)
             |SELECT id, MIN(m) AS root FROM r GROUP BY id ORDER BY id""".stripMargin),
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

    // Near-dup pair ALIGNMENT audit: for every verified Jaccard pair,
    // the longest common token prefix and suffix — tells a curator
    // whether duplicates are head/tail boilerplate wraps (long lcp/lcs,
    // mid-doc divergence) or shuffled rewrites (short both). Arrays are
    // bound as named columns and indexed with element_at (O(1) per
    // probe; the rule-10 re-evaluation trap never fires because nothing
    // re-derives the array per element); the suffix is capped at
    // min-len − lcp so the two spans never overlap. Exact, integer,
    // oracle-replicated via list comprehensions.
    QueryDef(
      "q260_dup_align",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val pairs = Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
          .select(col("a_id"), col("b_id"))
        pairs
          .join(d.select(col("doc_id").as("a_id"), col("toks").as("ta")), "a_id")
          .join(d.select(col("doc_id").as("b_id"), col("toks").as("tb")), "b_id")
          .withColumn("la", size(col("ta")).cast("long"))
          .withColumn("lb", size(col("tb")).cast("long"))
          .withColumn("m", least(col("la"), col("lb")))
          .withColumn("lcp", coalesce(
            array_min(expr(
              "filter(transform(sequence(1, int(m)), i -> IF(ta[i-1] = tb[i-1], -1, i)), x -> x > 0)"))
              .cast("long") - 1L,
            col("m")))
          .withColumn("lcs_raw", coalesce(
            array_min(expr(
              "filter(transform(sequence(1, int(m)), i -> IF(ta[int(la)-i] = tb[int(lb)-i], -1, i)), x -> x > 0)"))
              .cast("long") - 1L,
            col("m")))
          .select(col("a_id"), col("b_id"), col("la"), col("lb"), col("lcp"),
            least(col("lcs_raw"), col("m") - col("lcp")).as("lcs"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, toks,
             |    list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
             |                   FOR i IN generate_series(1, len(toks)-2)]) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
             |  WHERE len(toks) >= 3),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    a.toks AS ta, b.toks AS tb
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5),
             |x AS (
             |  SELECT a_id, b_id,
             |    CAST(len(ta) AS BIGINT) AS la, CAST(len(tb) AS BIGINT) AS lb,
             |    CAST(LEAST(len(ta), len(tb)) AS BIGINT) AS m, ta, tb
             |  FROM pairs),
             |y AS (
             |  SELECT a_id, b_id, la, lb, m,
             |    COALESCE(list_min([i FOR i IN generate_series(1, CAST(m AS INTEGER))
             |                       IF ta[i] <> tb[i]]) - 1, m) AS lcp,
             |    COALESCE(list_min([i FOR i IN generate_series(1, CAST(m AS INTEGER))
             |                       IF ta[la - i + 1] <> tb[lb - i + 1]]) - 1, m) AS lcs_raw
             |  FROM x)
             |SELECT a_id, b_id, la, lb, CAST(lcp AS BIGINT) AS lcp,
             |  CAST(LEAST(lcs_raw, m - lcp) AS BIGINT) AS lcs
             |FROM y ORDER BY a_id, b_id""".stripMargin),
    ),

    // Dedup THRESHOLD retention curve: how many documents survive
    // cluster-collapse at Jaccard cutoffs 0.90..0.99 (the corpus's occupied band
    // — its near-dups are tight rewrites, so the informative knee sits
    // high) — the tuning table a
    // curator reads before committing to a dedup threshold (too loose
    // destroys data, too tight leaves duplicates; the knee is
    // data-dependent). The pair pipeline runs ONCE at the loosest
    // cutoff (pinned); each cutoff filters the ppm-quantized pair list
    // and re-clusters the (tiny) filtered graph. survivors = N −
    // (members − clusters), the min-id-survivor contract.
    QueryDef(
      "q264_dedup_threshold_curve",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val pairs = PinnedCache.pin(
          Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id"),
              round(col("jaccard") * 1000000).cast("long").as("j_ppm")))
        val total = docs.agg(count(lit(1)).as("n_docs"))
        // the five per-cutoff CC ladders are independent — overlap their
        // eager rounds on driver threads (§2.6 / DriverPar); identical
        // frames, identical union order
        val per = DriverPar.map(s, Seq(900000L, 960000L, 970000L,
            980000L, 990000L)) { t =>
          val e = pairs.where(col("j_ppm") >= t).select(col("a_id"), col("b_id"))
          val agg = Dedup.connectedComponents(e)
            .agg(count(lit(1)).as("n_members"),
              countDistinct(col("root")).as("n_clusters"))
          e.agg(count(lit(1)).as("n_pairs")).crossJoin(agg)
            .select(lit(t).as("t_ppm"), col("n_pairs"), col("n_members"),
              col("n_clusters"))
        }.reduce(_ unionByName _)
        per.crossJoin(broadcast(total))
          .select(col("t_ppm"), col("n_pairs"), col("n_members"), col("n_clusters"),
            (col("n_docs") - (col("n_members") - col("n_clusters"))).as("n_survivors"))
          .orderBy(col("t_ppm"))
      },
      Some({
        val perT = Seq(900000L, 960000L, 970000L, 980000L, 990000L).map { t =>
          s"""e$t AS MATERIALIZED (
             |  SELECT a_id AS src, b_id AS dst FROM pp WHERE j_ppm >= $t
             |  UNION SELECT b_id, a_id FROM pp WHERE j_ppm >= $t),
             |r$t(id, m) AS (
             |  SELECT src, src FROM e$t
             |  UNION
             |  SELECT r.id, e.dst FROM r$t r JOIN e$t e ON e.src = r.m),
             |s$t AS (SELECT id, MIN(m) AS root FROM r$t GROUP BY id)""".stripMargin
        }.mkString(",\n")
        val rows = Seq(900000L, 960000L, 970000L, 980000L, 990000L).map { t =>
          s"""SELECT CAST($t AS BIGINT) AS t_ppm,
             |  (SELECT COUNT(*) FROM pp WHERE j_ppm >= $t)::BIGINT AS n_pairs,
             |  (SELECT COUNT(*) FROM s$t)::BIGINT AS n_members,
             |  (SELECT COUNT(DISTINCT root) FROM s$t)::BIGINT AS n_clusters,
             |  (SELECT COUNT(*) FROM documents)::BIGINT
             |    - (SELECT COUNT(*) FROM s$t)
             |    + (SELECT COUNT(DISTINCT root) FROM s$t) AS n_survivors""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH RECURSIVE sh AS MATERIALIZED (
           |  SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
           |                                FOR i IN generate_series(1, len(toks)-2)]) AS s
           |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
           |  WHERE len(toks) >= 3),
           |pp AS MATERIALIZED (
           |  SELECT a_id, b_id, CAST(ROUND(ROUND(jac, 6) * 1000000) AS BIGINT) AS j_ppm
           |  FROM (
           |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |      CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
           |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) AS jac
           |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |  WHERE jac >= 0.5),
           |$perT
           |SELECT * FROM ($rows) ORDER BY t_ppm""".stripMargin
      }),
    ),

    // Survivor-quality REGRET: the min-id survivor rule (q24/q44's
    // deterministic contract) is cheap but quality-blind — per near-dup
    // cluster, how much quality (q174 ppm scoring) the kept doc gives up
    // vs the best member. The table that justifies (or rejects) the
    // keep-highest-quality strategy (q72) on real data: regret 0 means
    // min-id is free; a fat tail means survivors should be chosen by
    // quality. One CC + one cluster-keyed rollup.
    QueryDef(
      "q266_survivor_regret",
      (s, dir) => {
        val t = TextAnalysis
        val d = tbl(s, dir, "documents")
        val q = d.select(col("doc_id"),
          round(t.qualityScore(col("text"), t.tokenCount(col("text"))) * 1000000)
            .cast("long").as("q_ppm"))
        val cc = Dedup.connectedComponents(
          Dedup.jaccardPairs(d, "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id")))
        cc.join(q, cc("id") === q("doc_id"))
          .groupBy(col("root"))
          .agg(count(lit(1)).as("n_members"),
            max(when(col("id") === col("root"), col("q_ppm"))).as("q_survivor_ppm"),
            max(col("q_ppm")).as("q_best_ppm"))
          .select(col("root"), col("n_members"), col("q_survivor_ppm"),
            col("q_best_ppm"),
            (col("q_best_ppm") - col("q_survivor_ppm")).as("regret_ppm"))
          .orderBy(col("root"))
      },
      Some(s"""WITH RECURSIVE sh AS (
              |  SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
              |                                FOR i IN generate_series(1, len(toks)-2)]) AS s
              |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
              |  WHERE len(toks) >= 3),
              |pairs AS MATERIALIZED (
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
              |cc AS (SELECT id, MIN(m) AS root FROM r GROUP BY id),
              |q AS (
              |  SELECT doc_id, CAST(ROUND(ROUND(
              |    LEAST(t / 50.0, 1.0) * 0.4 +
              |    (CAST(len(list_filter(toks, w -> w IN
              |       (${TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE) / t) * 0.3 +
              |    CASE WHEN (c - (t - 1)) / CAST(t AS DOUBLE) BETWEEN 3 AND 8
              |         THEN 0.3 ELSE 0.0 END, 6) * 1000000) AS BIGINT) AS q_ppm
              |  FROM (SELECT doc_id, string_split(text,' ') AS toks,
              |               len(string_split(text,' ')) AS t, LENGTH(text) AS c
              |        FROM documents))
              |SELECT root, COUNT(*)::BIGINT AS n_members,
              |  CAST(MAX(CASE WHEN id = root THEN q_ppm END) AS BIGINT) AS q_survivor_ppm,
              |  CAST(MAX(q_ppm) AS BIGINT) AS q_best_ppm,
              |  CAST(MAX(q_ppm) - MAX(CASE WHEN id = root THEN q_ppm END) AS BIGINT)
              |    AS regret_ppm
              |FROM cc JOIN q ON q.doc_id = cc.id
              |GROUP BY root ORDER BY root""".stripMargin),
    ),

    // Content-defined chunking (the Rabin/FastCDC shape) + chunk-level
    // dedup accounting per source: a token position closes a chunk iff the
    // position-weighted fingerprint of the 3-token window ending there is
    // ≡ 0 mod 16 (expected chunk ≈ 16 tokens; boundaries depend only on
    // CONTENT, so shared passages chunk identically regardless of offset —
    // the property fixed-stride chunking lacks). Window fingerprints are
    // O(1) from the q258 prefix-sum identity; each chunk's content
    // fingerprint needs only its own group's Σh, Σp·h, min p — one
    // doc-keyed window pass plus one (doc, chunk) rollup, all partial-agg.
    // h < 2^40 keeps every product ANSI-safe to ~16k-token docs (the
    // decimal(38) switch is the documented escape).
    QueryDef(
      "q289_cdc_chunks",
      (s, dir) => {
        Dedup.cdcChunks(tbl(s, dir, "documents")).groupBy("source")
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct(struct(col("len"), col("fpc"))).as("n_distinct"),
            sum("len").as("tokens"))
          .select(col("source"), col("n_chunks"), col("n_distinct"), col("tokens"),
            expr("(n_chunks - n_distinct) * 1000000 div n_chunks").as("dup_ppm"),
            expr("tokens * 1000 div n_chunks").as("mean_len_ppk"))
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, CAST(p AS BIGINT) AS p,
             |    CAST(('0x' || substring(md5(toks[p]),1,15)) AS BIGINT) % 1099511627776 AS h
             |  FROM (SELECT doc_id, source, toks, unnest(generate_series(1, len(toks))) AS p
             |        FROM (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents))),
             |fp AS (
             |  SELECT doc_id, source, p, h,
             |    CASE WHEN p >= 3 AND
             |      (CAST(SUM(p*h) OVER w3 AS BIGINT) - (p-3)*CAST(SUM(h) OVER w3 AS BIGINT)) % 16 = 0
             |    THEN 1 ELSE 0 END AS bnd
             |  FROM t WINDOW w3 AS (PARTITION BY doc_id ORDER BY p ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
             |ch AS (
             |  SELECT doc_id, source, p, h,
             |    COALESCE(CAST(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cid
             |  FROM fp),
             |agg AS (
             |  SELECT doc_id, source, cid, COUNT(*) AS len,
             |    CAST(SUM(p*h) AS BIGINT) - (MIN(p)-1)*CAST(SUM(h) AS BIGINT) AS fpc
             |  FROM ch GROUP BY 1, 2, 3)
             |SELECT source, COUNT(*) AS n_chunks,
             |  COUNT(DISTINCT (len, fpc)) AS n_distinct,
             |  CAST(SUM(len) AS BIGINT) AS tokens,
             |  CAST((COUNT(*) - COUNT(DISTINCT (len, fpc))) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm,
             |  CAST(CAST(SUM(len) AS BIGINT) * 1000 // COUNT(*) AS BIGINT) AS mean_len_ppk
             |FROM agg GROUP BY source ORDER BY source""".stripMargin),
    ),


    // Dedup CONFIG ADVISOR (the r9-verdict composition): per candidate
    // Jaccard cutoff × MinHash band shape, ONE table with the empirical
    // candidate-stage recall (q143's measurement generalized over band
    // shapes on a single pinned signature frame), the survivor count
    // after min-id cluster collapse (q264) and the chars reclaimed from
    // non-survivors (q244) — the row a curator reads before committing a
    // 100 TB run. Unigram sets on the 1/10 audit sample (the q143
    // discipline: exact ground truth is quadratic, so it runs on the
    // sample; banded recall depends only on J and the shape, so it
    // transfers). Integer/ppm arithmetic end to end; recall is NULL when
    // a cutoff has no true pairs (CASE-guarded in both engines). The
    // analytic_recall_ppm column is the closed-form 1−(1−(t/10⁶)^r)^b
    // floor in fixed-point ppm (identical floor-div chain in both
    // engines) — the extrapolation model a curator carries past the
    // audit sample's band; DedupAdvisorSpec pins it against the exact
    // per-pair expectation within binomial noise.
    QueryDef(
      "q305_dedup_config_advisor",
      (s, dir) => Dedup.dedupConfigAdvisor(tbl(s, dir, "documents"),
          "text", "doc_id", "n_chars",
          thresholdsPpm = Seq(500000L, 700000L, 900000L, 960000L),
          rowsPerBand = Seq(2, 4), numHashes = 16, k = 1,
          sampleNum = 1, sampleDenom = 10)
        .orderBy(col("t_ppm"), col("rows_per_band")),
      Some({
        val ts = Seq(500000L, 700000L, 900000L, 960000L)
        val rs = Seq(2, 4)
        val candCtes = rs.map { r =>
          s"""bk$r AS (
             |  SELECT doc_id, i // $r AS band,
             |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
             |  FROM m GROUP BY doc_id, i // $r),
             |cand$r AS MATERIALIZED (
             |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             |  FROM bk$r x JOIN bk$r y
             |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin
        }.mkString(",\n")
        val ccCtes = ts.map { t =>
          s"""e$t AS MATERIALIZED (
             |  SELECT a_id AS src, b_id AS dst FROM pp WHERE j_ppm >= $t
             |  UNION SELECT b_id, a_id FROM pp WHERE j_ppm >= $t),
             |r$t(id, lab) AS (
             |  SELECT src, src FROM e$t
             |  UNION
             |  SELECT r.id, e.dst FROM r$t r JOIN e$t e ON e.src = r.lab),
             |s$t AS MATERIALIZED (SELECT id, MIN(lab) AS root FROM r$t GROUP BY id)""".stripMargin
        }.mkString(",\n")
        val rows = (for (t <- ts; r <- rs) yield {
          val nt = s"(SELECT COUNT(*) FROM pp WHERE j_ppm >= $t)"
          val nf = s"""(SELECT COUNT(*) FROM pp p JOIN cand$r c
                      |     ON p.a_id = c.a_id AND p.b_id = c.b_id
                      |     WHERE p.j_ppm >= $t)""".stripMargin
          val rem = s"(SELECT COUNT(*) FROM s$t WHERE id <> root)"
          val an = Dedup.analyticRecallSql(t, 16 / r, r, "//")
          s"""SELECT CAST($t AS BIGINT) AS t_ppm,
             |  CAST(${16 / r} AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
             |  $nt::BIGINT AS n_true_pairs, $nf::BIGINT AS n_found,
             |  CASE WHEN $nt > 0 THEN ($nf * 1000000) // $nt ELSE NULL END AS recall_ppm,
             |  $an::BIGINT AS analytic_recall_ppm,
             |  (SELECT COUNT(*) FROM t0)::BIGINT - $rem AS n_survivors,
             |  $rem::BIGINT AS docs_removed,
             |  COALESCE((SELECT CAST(SUM(d.n_chars) AS BIGINT)
             |            FROM s$t l JOIN t0 d ON d.doc_id = l.id
             |            WHERE l.id <> l.root), 0) AS chars_saved""".stripMargin
        }).mkString("\nUNION ALL\n")
        s"""WITH RECURSIVE t0 AS MATERIALIZED (
           |  SELECT doc_id, n_chars, string_split(text,' ') AS tokens FROM documents
           |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15))
           |             AS BIGINT) % 10 < 1),
           |sh AS MATERIALIZED (
           |  SELECT doc_id, list_distinct(tokens) AS s FROM t0 WHERE len(tokens) >= 1),
           |pp AS MATERIALIZED (
           |  SELECT a_id, b_id, CAST(ROUND(ROUND(jac, 6) * 1000000) AS BIGINT) AS j_ppm
           |  FROM (
           |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |      CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
           |        /(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) AS jac
           |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |  WHERE jac >= 0.5),
           |gs AS (SELECT doc_id, unnest(s) AS g FROM sh),
           |m AS MATERIALIZED (
           |  SELECT doc_id, i,
           |    MIN(CAST(('0x' || substring(md5(g || ':' || i),1,15)) AS BIGINT)) AS mh
           |  FROM gs, unnest(generate_series(0, 15)) hh(i)
           |  GROUP BY doc_id, i),
           |$candCtes,
           |$ccCtes
           |SELECT * FROM (
           |$rows
           |) ORDER BY t_ppm, rows_per_band""".stripMargin
      }),
    ),

    // LEAKAGE-SAFE train/val/test split — the dedup-aware assignment
    // (r13): the q45 per-document md5 split leaks near-duplicates
    // across the boundary (a test doc's near-copy trains the model),
    // so the split key is the near-dup CLUSTER root: every member of
    // a q44 component lands in the same split, singletons split by
    // their own id — the assignment degenerates to the plain doc
    // split exactly when there are no duplicates
    // (Dedup.leakageSafeSplit). The oracle replays the recursive CC +
    // the md5 bucket on the root.
    QueryDef(
      "q350_leakage_safe_split",
      (s, dir) => Dedup.leakageSafeSplit(
          tbl(s, dir, "documents"), "doc_id",
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id")),
          trainPct = 80, valPct = 10)
        .orderBy(col("id")),
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
             |j AS (SELECT d.doc_id AS id, COALESCE(l.root, d.doc_id) AS root
             |      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
             |SELECT id, root,
             |  CASE WHEN CAST(('0x' || substring(md5(CAST(root AS VARCHAR)),1,15))
             |            AS BIGINT) % 100 < 80 THEN 'train'
             |       WHEN CAST(('0x' || substring(md5(CAST(root AS VARCHAR)),1,15))
             |            AS BIGINT) % 100 < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM j ORDER BY id""".stripMargin),
    ),

    // Leakage-safe GROUP k-fold (q350's cross-validation sibling):
    // fold = hash(near-dup cluster root) mod 5, so near-copies never
    // straddle a CV train/eval boundary; dup-free documents fold by
    // their own id. Same pair-sized CC + corpus left-join shape.
    QueryDef(
      "q368_group_kfold",
      (s, dir) => Dedup.groupKFold(
          tbl(s, dir, "documents"), "doc_id",
          Dedup.jaccardPairs(tbl(s, dir, "documents"), "text", "doc_id", 0.5)
            .select(col("a_id"), col("b_id")),
          k = 5)
        .orderBy(col("id")),
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
             |j AS (SELECT d.doc_id AS id, COALESCE(l.root, d.doc_id) AS root
             |      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
             |SELECT id, root,
             |  CAST(('0x' || substring(md5(CAST(root AS VARCHAR)),1,15))
             |       AS BIGINT) % 5 AS fold
             |FROM j ORDER BY id""".stripMargin),
    ),


    // Near-dup pairs answered ENTIRELY from a PERSISTED MinHash index
    // (r13 verdict item 4, the dedup half of q351): the query builds the
    // index (portable md5-family signatures + shingle sets as parquet —
    // the artifacts a production nightly would precompute ONCE), then
    // answers from the stored tables alone — the corpus text is never
    // re-read. The oracle replays the md5 banding + exact verify from the
    // documents table: any bit the parquet round-trip or the from-index
    // plan changed would break the hash. 16 hashes, r=2 bands, 3-shingles,
    // exact Jaccard >= 0.5 (IndexStoreSpec pins round-trip ≡ inline).
    QueryDef(
      "q352_minhash_from_index",
      (s, dir) => {
        val path = QueryDef.indexRoot(dir) + "/minhash"
        IndexStore.writeMinhashIndex(path, tbl(s, dir, "documents"),
          "text", "doc_id", numHashes = 16, k = 3)
        IndexStore.minhashPairsFromIndex(s, path,
            numHashes = 16, r = 2, threshold = 0.5)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text,' ') AS tokens FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM t WHERE len(tokens) >= 3),
             |gs AS (SELECT doc_id, unnest(s) AS g FROM sh),
             |m AS (
             |  SELECT doc_id, i,
             |    MIN(CAST(('0x' || substring(md5(g || ':' || i),1,15)) AS BIGINT)) AS mh
             |  FROM gs, unnest(generate_series(0, 15)) t(i)
             |  GROUP BY doc_id, i),
             |bk AS (
             |  SELECT a.doc_id, a.i // 2 AS band, a.mh AS m1, b.mh AS m2
             |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND b.i = a.i + 1 AND a.i % 2 = 0),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             |  FROM bk x JOIN bk y
             |    ON x.band = y.band AND x.m1 = y.m1 AND x.m2 = y.m2
             |    AND x.doc_id < y.doc_id),
             |verified AS (
             |  SELECT c.a_id, c.b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |  FROM cand c JOIN sh a ON a.doc_id = c.a_id JOIN sh b ON b.doc_id = c.b_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.5)
             |SELECT a_id, b_id, jaccard FROM verified ORDER BY a_id, b_id""".stripMargin),
    ),

    // Nightly MinHash maintenance: index 3/4 of the corpus, APPEND the
    // remaining quarter (shingles + signatures computed for the DELTA
    // only — per-doc columns are row-local, so append ≡ full rebuild bit
    // for bit), then serve near-dup pairs from the updated index. The
    // oracle replays the full-corpus md5 banding + exact verify with no
    // notion of the split; different numHashes/threshold than q352 so
    // the two queries pin different banding plans.
    QueryDef(
      "q354_minhash_append",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val path = QueryDef.indexRoot(dir) + "/minhash_app"
        IndexStore.writeMinhashIndex(path,
          docs.where(col("doc_id") % 4 =!= 1),
          "text", "doc_id", numHashes = 12, k = 3)
        IndexStore.appendToMinhashIndex(path,
          docs.where(col("doc_id") % 4 === 1),
          "text", "doc_id", numHashes = 12, k = 3)
        IndexStore.minhashPairsFromIndex(s, path,
            numHashes = 12, r = 2, threshold = 0.6)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text,' ') AS tokens FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct([tokens[i]||' '||tokens[i+1]||' '||tokens[i+2]
             |                                FOR i IN generate_series(1, len(tokens)-2)]) AS s
             |  FROM t WHERE len(tokens) >= 3),
             |gs AS (SELECT doc_id, unnest(s) AS g FROM sh),
             |m AS (
             |  SELECT doc_id, i,
             |    MIN(CAST(('0x' || substring(md5(g || ':' || i),1,15)) AS BIGINT)) AS mh
             |  FROM gs, unnest(generate_series(0, 11)) t(i)
             |  GROUP BY doc_id, i),
             |bk AS (
             |  SELECT a.doc_id, a.i // 2 AS band, a.mh AS m1, b.mh AS m2
             |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND b.i = a.i + 1 AND a.i % 2 = 0),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             |  FROM bk x JOIN bk y
             |    ON x.band = y.band AND x.m1 = y.m1 AND x.m2 = y.m2
             |    AND x.doc_id < y.doc_id),
             |verified AS (
             |  SELECT c.a_id, c.b_id,
             |    ROUND(CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 6) AS jaccard
             |  FROM cand c JOIN sh a ON a.doc_id = c.a_id JOIN sh b ON b.doc_id = c.b_id
             |  WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             |        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.6)
             |SELECT a_id, b_id, jaccard FROM verified ORDER BY a_id, b_id""".stripMargin),
    ),
  )
}
