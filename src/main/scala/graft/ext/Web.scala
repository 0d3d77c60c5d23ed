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
}
