package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/host canonicalization + host-level dedup rollup — the crawl-corpus
  * normalization real pipelines run BEFORE any text dedup (the same page
  * arrives as `http://WWW.Site.com:80/a/?utm_source=feed#top` and
  * `https://site.com/a`; without canonical keys, per-host accounting and
  * URL-level dedup both fracture).
  *
  * Everything is pure string/integer column work (split_part/substr/LIKE —
  * deliberately no regex, whose dialects diverge across engines), so the
  * whole canonicalizer is DuckDB-replicable and oracle-checked per row.
  * Map-only: at 100 TB this is one scan inside WholeStageCodegen, no
  * shuffle until the caller's per-host aggregate.
  *
  * Canonical form: lowercase scheme and host, `www.` prefix stripped,
  * default ports dropped (`:80` for http, `:443` for https; real ports
  * kept), fragment dropped, tracking params (`utm_*`, `fbclid`, `gclid`)
  * removed with remaining param order preserved, one trailing `/` stripped
  * from the path. */
object Web {

  /** Lowercased scheme of `scheme://...`. */
  def schemeOf(url: Column): Column = lower(split_part(url, lit("://"), lit(1)))

  private def afterScheme(url: Column): Column = split_part(url, lit("://"), lit(2))

  private def hostPort(url: Column): Column =
    split_part(afterScheme(url), lit("/"), lit(1))

  /** Canonical host: lowercase, `www.` stripped, port dropped. */
  def hostOf(url: Column): Column = {
    val h = lower(split_part(hostPort(url), lit(":"), lit(1)))
    when(h.startsWith("www."), substring(h, 5, 1 << 28)).otherwise(h)
  }

  /** Port with default-port stripping: empty when absent or the scheme
    * default. */
  def portOf(url: Column): Column = {
    val hp = hostPort(url)
    val p = when(hp.contains(":"), split_part(hp, lit(":"), lit(2))).otherwise(lit(""))
    val s = schemeOf(url)
    when((s === "http" && p === "80") || (s === "https" && p === "443"), lit(""))
      .otherwise(p)
  }

  /** Path + query + fragment (everything from the first `/` after the
    * authority; empty when the URL ends at the host). */
  private def pathQueryFrag(url: Column): Column = {
    val rest = afterScheme(url)
    val hp = hostPort(url)
    rest.substr(length(hp) + 1, lit(1 << 28))
  }

  /** Canonical path: fragment and query dropped, one trailing `/`
    * stripped (`/a/` == `/a`; a bare `/` collapses to empty). */
  def pathOf(url: Column): Column = {
    val p = split_part(split_part(pathQueryFrag(url), lit("#"), lit(1)), lit("?"), lit(1))
    when(p.endsWith("/"), p.substr(lit(1), length(p) - 1)).otherwise(p)
  }

  /** Canonical query: fragment dropped, tracking params removed, the
    * surviving params in original order; empty when nothing survives. */
  def queryOf(url: Column): Column = {
    val noFrag = split_part(pathQueryFrag(url), lit("#"), lit(1))
    val qs = when(noFrag.contains("?"), split_part(noFrag, lit("?"), lit(2)))
      .otherwise(lit(""))
    val kept = filter(split(qs, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p === ""))
    concat_ws("&", kept)
  }

  /** The full canonical URL. */
  def canonicalizeUrl(url: Column): Column = {
    val port = portOf(url)
    val q = queryOf(url)
    concat(
      schemeOf(url), lit("://"), hostOf(url),
      when(port === "", lit("")).otherwise(concat(lit(":"), port)),
      pathOf(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Deterministic MESSY-URL fixture from document fields (the testdata
    * carries no URL column): scheme-case noise, `www.` prefixes, host
    * case noise, default and real ports, trailing slashes, tracking
    * params, fragments — every branch pure integer/string ops both
    * engines reproduce identically ([[fixtureUrlSql]] is the same
    * construction in DuckDB SQL). */
  def fixtureUrl(docId: Column, source: Column, lang: Column): Column = {
    val scheme = element_at(array(lit("http"), lit("https"), lit("HTTPS")),
      (docId % 3).cast("int") + 1)
    val schemeLower = lower(scheme)
    val hostBase = concat(source, lit("-"), lang, lit(".example"),
      (docId % 7).cast("string"), lit(".com"))
    val host = when(docId % 5 === 0, upper(hostBase)).otherwise(hostBase)
    val www = when(docId % 2 === 0, lit("www.")).otherwise(lit(""))
    val port = when(docId % 4 === 0,
        when(schemeLower === "http", lit(":80")).otherwise(lit(":443")))
      .when(docId % 11 === 0, lit(":8080"))
      .otherwise(lit(""))
    val path = concat(lit("/docs/"), (docId % 50).cast("string"),
      when(docId % 6 === 0, lit("/")).otherwise(lit("")))
    val query = when(docId % 3 === 0,
        concat(lit("?utm_source=feed&id="), (docId % 10).cast("string")))
      .when(docId % 3 === 1,
        concat(lit("?id="), (docId % 10).cast("string"), lit("&utm_campaign=x&ref=rss")))
      .otherwise(lit(""))
    val frag = when(docId % 8 === 0, lit("#sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, query, frag)
  }

  /** [[fixtureUrl]] as DuckDB SQL over columns `doc_id`, `source`,
    * `lang`. */
  val fixtureUrlSql: String =
    """(CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'https' ELSE 'HTTPS' END)
      | || '://'
      | || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
      | || (CASE WHEN doc_id % 5 = 0
      |      THEN upper(source || '-' || lang || '.example' || CAST(doc_id % 7 AS VARCHAR) || '.com')
      |      ELSE source || '-' || lang || '.example' || CAST(doc_id % 7 AS VARCHAR) || '.com' END)
      | || (CASE WHEN doc_id % 4 = 0
      |      THEN (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END)
      |      WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
      | || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
      | || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
      | || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
      |      WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_campaign=x&ref=rss'
      |      ELSE '' END)
      | || (CASE WHEN doc_id % 8 = 0 THEN '#sec2' ELSE '' END)""".stripMargin

  /** The canonicalizer as DuckDB SQL: a CTE chain reading a prior CTE `u`
    * with a column `url`, ending in CTE `c` exposing `curl`, `host`,
    * `port`, `cpath`, `cquery` (compose as
    * `WITH u AS (...), $canonicalizeSql SELECT ... FROM c`). Same
    * split_part/substr/LIKE steps as the Column form. */
  val canonicalizeSql: String =
    """parts AS (
      |  SELECT *, lower(split_part(url, '://', 1)) AS scheme,
      |    split_part(split_part(url, '://', 2), '/', 1) AS hp,
      |    substr(split_part(url, '://', 2),
      |           len(split_part(split_part(url, '://', 2), '/', 1)) + 1) AS pqf
      |  FROM u),
      |comp AS (
      |  SELECT *,
      |    CASE WHEN lower(split_part(hp, ':', 1)) LIKE 'www.%'
      |      THEN substr(lower(split_part(hp, ':', 1)), 5)
      |      ELSE lower(split_part(hp, ':', 1)) END AS host,
      |    CASE WHEN (scheme = 'http' AND split_part(hp, ':', 2) = '80')
      |           OR (scheme = 'https' AND split_part(hp, ':', 2) = '443')
      |      THEN '' ELSE
      |        (CASE WHEN contains(hp, ':') THEN split_part(hp, ':', 2) ELSE '' END)
      |      END AS port,
      |    split_part(split_part(pqf, '#', 1), '?', 1) AS rawpath,
      |    CASE WHEN contains(split_part(pqf, '#', 1), '?')
      |      THEN split_part(split_part(pqf, '#', 1), '?', 2) ELSE '' END AS rawq
      |  FROM parts),
      |canon AS (
      |  SELECT *,
      |    CASE WHEN rawpath LIKE '%/' THEN substr(rawpath, 1, len(rawpath) - 1)
      |      ELSE rawpath END AS cpath,
      |    COALESCE(array_to_string(list_filter(string_split(rawq, '&'),
      |      p -> NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'fbclid=%'
      |                OR p LIKE 'gclid=%' OR p = '')), '&'), '') AS cquery
      |  FROM comp),
      |c AS (
      |  SELECT *, scheme || '://' || host
      |    || (CASE WHEN port = '' THEN '' ELSE ':' || port END)
      |    || cpath
      |    || (CASE WHEN cquery = '' THEN '' ELSE '?' || cquery END) AS curl
      |  FROM canon)""".stripMargin

  // --- HTML main-content extraction (boilerplate removal) ----------------
  //
  // The step BETWEEN crawling and every text operator above: raw pages are
  // markup + navigation + scripts; training corpora keep only the main
  // content. The rule here is the jusText/Arc90 family's core signal, link
  // density: a block survives iff it is a paragraph block AND its anchor
  // text is under half its text (2*link_chars < text_chars — integer, no
  // division). Real pipelines add language models and DOM heuristics on
  // top; the block-classify-join shape is identical.
  //
  // Scale shape: map-only — regex extraction and per-block classification
  // run inside one scan projection; no shuffle until the caller's rollup.
  // The HOF lambdas are interpreted (DEVNOTES rule 10), so each derived
  // array is projected ONCE as a named column and referenced as a bound
  // attribute — no capture re-evaluates a regex per element.
  //
  // Fixture: [[syntheticHtml]] renders each document's tokens into flat
  // HTML deterministically (tag and link choices = portable-hash bits of
  // (doc_id, run, word) — the q116 render-then-decode pattern), so the
  // DuckDB oracle replicates generation AND extraction bit-for-bit while
  // the Spark side exercises the real operator.

  /** Portable-hash SQL-expression fragment (Spark dialect) for use inside
    * `expr(...)` lambdas. */
  private def hashExprSql(parts: String): String =
    s"cast(conv(substring(md5($parts), 1, 15), 16, 10) as bigint)"

  /** Deterministic flat-HTML rendering of a token list: runs of 4 tokens
    * become `<p>/<nav>/<script>` blocks (hash of (doc_id, run) mod 5: 3 ->
    * nav, 4 -> script, else p); each word becomes an `<a>` link when hash
    * of (doc_id, run, word) mod 4 = 0. */
  def syntheticHtml(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tagCase = (j: String) =>
      s"""case ${hashExprSql(s"concat(cast(doc_id as string), ':', cast($j as string))")} % 5
         |  when 3 then 'nav' when 4 then 'script' else 'p' end""".stripMargin
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("bl", expr(
        s"""transform(sequence(0, (size(toks) + 3) div 4 - 1), j ->
           |  concat('<', ${tagCase("j")}, '>',
           |    array_join(transform(slice(toks, j * 4 + 1, 4), (w, k) ->
           |      case when ${hashExprSql(
                   "concat(cast(doc_id as string), ':', cast(j as string), ':', cast(k as string))")} % 4 = 0
           |        then concat('<a>', w, '</a>') else w end), ' '),
           |    '</', ${tagCase("j")}, '>'))""".stripMargin))
      .select(col("doc_id"),
        concat(lit("<html><body>"), array_join(col("bl"), ""), lit("</body></html>"))
          .as("html"))
  }

  /** [[syntheticHtml]] with link TARGETS: each `<a>` word (same hash-bit
    * selection) carries an href to a deterministic synthetic host,
    * `https://h{H}.example.org/p{P}` with H/P = portable-hash bits of
    * (doc_id, run, word, 'href') — so a host-level link graph is a pure
    * function of the corpus (the q116/q136 render-then-extract pattern:
    * the oracle re-derives targets from tokens while Spark exercises the
    * real regex extraction). */
  def syntheticHtmlLinks(df: DataFrame, idCol: String, textCol: String,
      nHosts: Int = 20): DataFrame = {
    val tagCase = (j: String) =>
      s"""case ${hashExprSql(s"concat(cast(doc_id as string), ':', cast($j as string))")} % 5
         |  when 3 then 'nav' when 4 then 'script' else 'p' end""".stripMargin
    val hrefHash = hashExprSql(
      "concat(cast(doc_id as string), ':', cast(j as string), ':', cast(k as string), ':href')")
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("bl", expr(
        s"""transform(sequence(0, (size(toks) + 3) div 4 - 1), j ->
           |  concat('<', ${tagCase("j")}, '>',
           |    array_join(transform(slice(toks, j * 4 + 1, 4), (w, k) ->
           |      case when ${hashExprSql(
                   "concat(cast(doc_id as string), ':', cast(j as string), ':', cast(k as string))")} % 4 = 0
           |        then concat('<a href="https://h', cast($hrefHash % $nHosts as string),
           |                    '.example.org/p', cast($hrefHash % 1000 as string), '">', w, '</a>')
           |        else w end), ' '),
           |    '</', ${tagCase("j")}, '>'))""".stripMargin))
      .select(col("doc_id"),
        concat(lit("<html><body>"), array_join(col("bl"), ""), lit("</body></html>"))
          .as("html"))
  }

  /** The [[syntheticHtmlLinks]] fixture's link TARGET HOSTS derived
    * DIRECTLY from token indices — one `(doc_id, dst)` row per selected
    * word slot, bit-identical to hostOf over
    * extractLinks(syntheticHtmlLinks(df)) by construction: the href
    * fixture selects slot (j, k) when hash(doc_id:j:k) % 4 = 0 and
    * targets host h{hash(doc_id:j:k:href) % nHosts}.example.org — a pure
    * function of doc_id and the token COUNT, so no HTML string is ever
    * built and no regex runs. This is the cheap fixture path for the
    * graph-tier queries whose subject is the graph, not the extraction;
    * the render+regex pipeline stays under test in q171/q172.
    * HostLinkGraphSpec pins equality of the two derivations. */
  def fixtureLinkHosts(df: DataFrame, idCol: String, textCol: String,
      nHosts: Int = 20): DataFrame = {
    val selHash = hashExprSql(
      "concat(cast(doc_id as string), ':', cast(j as string), ':', cast(k as string))")
    val hrefHash = hashExprSql(
      "concat(cast(doc_id as string), ':', cast(j as string), ':', cast(k as string), ':href')")
    df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("n"))
      .select(col("doc_id"), explode(expr(
        s"""flatten(transform(sequence(0, (n + 3) div 4 - 1), j ->
           |  filter(transform(sequence(0, least(4, n - j * 4) - 1), k ->
           |    case when $selHash % 4 = 0
           |      then concat('h', cast($hrefHash % $nHosts as string), '.example.org')
           |      else null end),
           |    x -> x is not null)))""".stripMargin)).as("dst"))
  }

  /** Outbound links from an HTML column: one `(doc_id, url)` row per
    * href attribute. Map-only regex extraction — the crawl-frontier /
    * link-graph feeder. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(expr(s"""regexp_extract_all($htmlCol, 'href="([^"]*)"', 1)"""))
        .as("url"))

  /** Block-level boilerplate removal over an HTML column: per-doc block
    * counts, link/text char totals, and the surviving main text (reported
    * as md5 + length so row size stays bounded). */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        expr(s"regexp_extract_all($htmlCol, '<(?:p|nav|script)>.*?</(?:p|nav|script)>', 0)")
          .as("blks"))
      .withColumn("tags", expr("transform(blks, b -> regexp_extract(b, '^<([a-z]+)>', 1))"))
      .withColumn("stripped", expr(
        "transform(blks, b -> regexp_replace(regexp_extract(b, '^<[a-z]+>(.*)</[a-z]+>$', 1), '</?a>', ''))"))
      .withColumn("linkchars", expr(
        "transform(blks, b -> aggregate(regexp_extract_all(b, '<a>(.*?)</a>', 1), 0L, (acc, x) -> acc + length(x)))"))
      .withColumn("main_text", expr(
        """array_join(filter(stripped, (s, i) ->
          |  element_at(tags, i + 1) = 'p' AND 2 * element_at(linkchars, i + 1) < length(s)), ' ')"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("blks")).cast("long").as("n_blocks"),
        expr("""cast(size(filter(stripped, (s, i) ->
                element_at(tags, i + 1) = 'p' AND 2 * element_at(linkchars, i + 1) < length(s))) as long)""")
          .as("n_kept"),
        expr("aggregate(linkchars, 0L, (acc, x) -> acc + x)").as("link_chars"),
        expr("aggregate(stripped, 0L, (acc, x) -> acc + length(x))").as("text_chars"),
        length(col("main_text")).cast("long").as("main_chars"),
        md5(col("main_text")).as("main_md5"))
}
