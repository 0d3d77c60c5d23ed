package graft.ext

import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** Multimodal & web family (CATALOG.md 'Multimodal'): image/audio codec fixtures, URL canonicalization, HTML extraction, cross-modal audits.
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object MultimodalQueries {

  def queries: Seq[QueryDef] = Seq(

    // Multimodal plumbing: binary payloads -> typed partition-wise decode
    // (stubbed codec, real Spark shape).
    QueryDef(
      "q34_multimodal",
      (s, dir) => Multimodal.decodeMeta(s,
          Multimodal.mediaFromDocuments(tbl(s, dir, "documents")))
        .toDF().orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             |  hex(encode(substring(text, 1, 8))) AS header_hex,
             |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
             |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
             |  3 AS channels
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),


    // Image perceptual-hash near-dup: docs render to REAL 9x8 grayscale
    // PNGs (deterministic pixels from token hashes), the pipeline decodes
    // them with the actual JDK codec, dHashes in pure integer math, and
    // band-blocks hamming pairs (4x15-bit slices — recall 1.0 for
    // dist <= 3 by pigeonhole, so the brute-force oracle matches EXACTLY).
    // PNG being lossless makes the decoded grays a pure function of the
    // text, so DuckDB replicates pixel gen + dHash + pair scan bit-exactly
    // (the q42 replicate-the-approximation pattern) while the Spark side
    // exercises the real encode->decode->hash->block pipeline an image
    // corpus needs.
    QueryDef(
      "q116_image_neardup",
      (s, dir) => Dedup.hammingNearDupPairsFromSigs(
          Multimodal.imageDHash(s,
            Multimodal.renderDocImages(s, tbl(s, dir, "documents")).toDF())
            .toDF().select(col("doc_id"), col("sig")),
          bits = 60, bands = 4, maxDist = 3)
        .orderBy(col("a_id"), col("b_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |px AS (SELECT doc_id,
             |  [CAST(('0x' || substring(md5(t[(p % greatest(len(t),1)) + 1]),1,15)) AS BIGINT) & 255
             |   FOR p IN generate_series(0, 71)] AS g
             |  FROM toks),
             |sig AS (SELECT doc_id,
             |  CAST(list_sum([CASE WHEN g[(i // 8) * 9 + (i % 8) + 1] < g[(i // 8) * 9 + (i % 8) + 2]
             |                 THEN (1::BIGINT << i) ELSE 0 END
             |                 FOR i IN generate_series(0, 59)]) AS BIGINT) AS sig
             |  FROM px)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sig, b.sig)) <= 3
             |ORDER BY a_id, b_id""".stripMargin),
    ),


    // URL canonicalization audit: every doc's messy fixture URL (scheme
    // case, www., default ports, tracking params, fragments, trailing
    // slashes) against its canonical form + host — the normalization a
    // crawl corpus needs before URL/host-level dedup. Pure split_part/
    // substr/LIKE string work (no regex dialects), map-only, oracle checks
    // every row of the canonicalizer.
    QueryDef(
      "q119_url_canonicalize",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val url = Web.fixtureUrl(col("doc_id"), col("source"), col("lang"))
        d.select(col("doc_id"), url.as("url"),
            Web.canonicalizeUrl(url).as("curl"), Web.hostOf(url).as("host"))
          .orderBy(col("doc_id"))
      },
      // plain concatenation: the interpolated SQL fragments contain `||`
      // at line starts, which an outer stripMargin would corrupt to `|`
      Some("WITH u AS (SELECT doc_id, " + Web.fixtureUrlSql +
        " AS url FROM documents),\n" + Web.canonicalizeSql +
        "\nSELECT doc_id, url, curl, host FROM c ORDER BY doc_id"),
    ),


    // Image near-dup CLUSTERS: q116's perceptual-hash pairs composed with
    // the single-job connected-components machinery (q44's) — the full
    // image-dedup story an multimodal corpus needs: decode -> dHash ->
    // banded hamming pairs -> clusters. Oracle: the q116 pixel/dHash
    // replica feeding q44's recursive-CTE components.
    QueryDef(
      "q121_image_clusters",
      (s, dir) => Dedup.connectedComponents(
          Dedup.hammingNearDupPairsFromSigs(
            Multimodal.imageDHash(s,
              Multimodal.renderDocImages(s, tbl(s, dir, "documents")).toDF())
              .toDF().select(col("doc_id"), col("sig")),
            bits = 60, bands = 4, maxDist = 3))
        .groupBy(col("root").as("root_id"))
        .agg(count(lit(1)).as("members"))
        .orderBy(col("root_id")),
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |px AS (SELECT doc_id,
             |  [CAST(('0x' || substring(md5(t[(p % greatest(len(t),1)) + 1]),1,15)) AS BIGINT) & 255
             |   FOR p IN generate_series(0, 71)] AS g
             |  FROM toks),
             |sig AS (SELECT doc_id,
             |  CAST(list_sum([CASE WHEN g[(i // 8) * 9 + (i % 8) + 1] < g[(i // 8) * 9 + (i % 8) + 2]
             |                 THEN (1::BIGINT << i) ELSE 0 END
             |                 FOR i IN generate_series(0, 59)]) AS BIGINT) AS sig
             |  FROM px),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
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


    // Audio acoustic-fingerprint near-dup — the third modality's dedup
    // (text: q24/q26/q63; image: q116/q121; audio: this). Docs render to
    // REAL RIFF/WAVE payloads (deterministic PCM16 samples from token
    // hashes), the pipeline parses them with the real RIFF/PCM decoder,
    // computes an integer delta-energy fingerprint (bit i = frame i+1
    // louder than frame i — the volume-tolerant acoustic-fingerprint
    // shape), and band-blocks hamming pairs exactly like q116. PCM being
    // lossless makes the decoded samples a pure function of the text, so
    // DuckDB replicates sample gen + frame energies + signature + pair
    // scan bit-exactly while the Spark side exercises the real
    // encode->parse->fingerprint->block pipeline an audio corpus needs.
    QueryDef(
      "q124_audio_neardup",
      (s, dir) => Dedup.hammingNearDupPairsFromSigs(
          Multimodal.audioFingerprint(s,
            Multimodal.renderDocWavs(s, tbl(s, dir, "documents")).toDF())
            .toDF().select(col("doc_id"), col("sig")),
          bits = 60, bands = 4, maxDist = 3)
        .orderBy(col("a_id"), col("b_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
             |sm AS (SELECT doc_id,
             |  [(CAST(('0x' || substring(md5(t[(p % greatest(len(t),1)) + 1]),1,15)) AS BIGINT) & 255) - 128
             |   FOR p IN generate_series(0, 243)] AS v
             |  FROM toks),
             |en AS (SELECT doc_id,
             |  [list_sum([v[k+1]*256*v[k+1]*256 FOR k IN generate_series(j*4, j*4+3)])
             |   FOR j IN generate_series(0, 60)] AS e
             |  FROM sm),
             |sig AS (SELECT doc_id,
             |  CAST(list_sum([CASE WHEN e[i+2] > e[i+1] THEN (1::BIGINT << i) ELSE 0 END
             |                 FOR i IN generate_series(0, 59)]) AS BIGINT) AS sig
             |  FROM en)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sig, b.sig)) <= 3
             |ORDER BY a_id, b_id""".stripMargin),
    ),


    // HTML main-content extraction (boilerplate removal by link density —
    // the jusText/Arc90 core rule): docs render to deterministic flat HTML
    // (hash-chosen p/nav/script blocks, hash-chosen <a> links — the q116
    // render-then-decode pattern), the operator strips markup and keeps
    // paragraph blocks with 2*link_chars < text_chars. Map-only; the
    // oracle replicates generation AND extraction bit-for-bit.
    QueryDef(
      "q136_html_main_content",
      (s, dir) => Web.mainContent(
          Web.syntheticHtml(tbl(s, dir, "documents"), "doc_id", "text"),
          "doc_id", "html")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |runs AS (
             |  SELECT doc_id, toks,
             |    [toks[j*4+1 : j*4+4] FOR j IN generate_series(0, (len(toks)+3)//4 - 1)] AS rws
             |  FROM t),
             |blocks AS (
             |  SELECT doc_id,
             |    [ '<' ||
             |      CASE (CAST(('0x'||substring(md5(doc_id || ':' || (j-1)),1,15)) AS BIGINT) % 5)
             |        WHEN 3 THEN 'nav' WHEN 4 THEN 'script' ELSE 'p' END
             |      || '>' ||
             |      array_to_string(
             |        [ CASE WHEN (CAST(('0x'||substring(md5(doc_id || ':' || (j-1) || ':' || (k-1)),1,15)) AS BIGINT) % 4) = 0
             |               THEN '<a>' || rws[j][k] || '</a>' ELSE rws[j][k] END
             |          FOR k IN generate_series(1, len(rws[j])) ], ' ')
             |      || '</' ||
             |      CASE (CAST(('0x'||substring(md5(doc_id || ':' || (j-1)),1,15)) AS BIGINT) % 5)
             |        WHEN 3 THEN 'nav' WHEN 4 THEN 'script' ELSE 'p' END
             |      || '>'
             |      FOR j IN generate_series(1, len(rws)) ] AS bl
             |  FROM runs),
             |html AS (
             |  SELECT doc_id, '<html><body>' || array_to_string(bl, '') || '</body></html>' AS html
             |  FROM blocks),
             |bx AS (
             |  SELECT doc_id,
             |    regexp_extract_all(html, '<(?:p|nav|script)>.*?</(?:p|nav|script)>') AS blks
             |  FROM html),
             |bs AS (
             |  SELECT doc_id, blks,
             |    [regexp_extract(b, '^<([a-z]+)>', 1) FOR b IN blks] AS tags,
             |    [regexp_replace(regexp_extract(b, '^<[a-z]+>(.*)</[a-z]+>$', 1), '</?a>', '', 'g') FOR b IN blks] AS stripped,
             |    [CAST(COALESCE(list_sum(list_transform(regexp_extract_all(b, '<a>(.*?)</a>', 1), x -> len(x))), 0) AS BIGINT) FOR b IN blks] AS linkchars
             |  FROM bx),
             |kept AS (
             |  SELECT doc_id,
             |    CAST(len(blks) AS BIGINT) AS n_blocks,
             |    CAST(len([i FOR i IN generate_series(1, len(blks)) IF tags[i] = 'p' AND 2*linkchars[i] < len(stripped[i])]) AS BIGINT) AS n_kept,
             |    CAST(COALESCE(list_sum(linkchars), 0) AS BIGINT) AS link_chars,
             |    CAST(COALESCE(list_sum([len(stripped[i]) FOR i IN generate_series(1, len(blks))]), 0) AS BIGINT) AS text_chars,
             |    COALESCE(array_to_string([stripped[i] FOR i IN generate_series(1, len(blks)) IF tags[i] = 'p' AND 2*linkchars[i] < len(stripped[i])], ' '), '') AS main_text
             |  FROM bs)
             |SELECT doc_id, n_blocks, n_kept, link_chars, text_chars,
             |  CAST(len(main_text) AS BIGINT) AS main_chars,
             |  md5(main_text) AS main_md5
             |FROM kept ORDER BY doc_id""".stripMargin),
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
  )
}
