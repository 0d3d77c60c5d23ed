package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Shared host-link-graph helpers (engine derivation + DuckDB CTE
  * replica + seed hosts) for the graph-tier oracles. The QueryDefs that
  * used to live here were split along CATALOG.md family lines in round 7
  * — see [[Ext]] for the file map. */
object ExtraQueries {

  /** Symmetrized host-level link graph (q171/q172's edge set): src host
    * from the doc's canonicalized fixture URL, dst hosts from the href
    * fixture — distinct (src, dst) edges plus their mirror. Map-only
    * until the distinct; node ids are strings (group/join keys never
    * need dense ints).
    *
    * Derivation: DIRECT from token indices ([[Web.fixtureLinkHosts]]) —
    * the href fixture's link targets are a pure hash function of
    * (doc_id, run, word-slot), so the graph-tier consumers (q187/q188/
    * q220–q222/q307/q309 and the composition queries) skip the HTML
    * render + regex re-extraction that q171/q172 exist to exercise.
    * Bit-identical to extractLinks(syntheticHtmlLinks(…)) by
    * construction — same md5 bits, same (j, k) ranges — and pinned so
    * by HostLinkGraphSpec against the rendered path. The render+regex
    * pipeline itself stays under test in q171/q172, whose oracles
    * re-derive targets from tokens exactly like this. */
  private[ext] def hostLinkGraph(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val links = Web.fixtureLinkHosts(d, "doc_id", "text")
    val srcH = d.select(col("doc_id"),
      Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
        .as("src"))
    // ONE distinct instead of two (guide §2.4): canonicalize each link to
    // (min, max) BEFORE the dedup, then emit both orientations from the
    // deduplicated canonical set — (src<dst) rows and their reverses are
    // disjoint by construction and self-loops appear exactly once, so the
    // union needs no second full-graph distinct. The produced edge SET is
    // identical to distinct(e ∪ reverse(e)) of the raw links.
    val canon = links.join(srcH, "doc_id")
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()
    canon.unionByName(
      canon.where(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
  }

  /** DuckDB replica of [[hostLinkGraph]]: CTE chain ending in `sym`
    * (src, dst) and `deg` (src, deg) — the q172 derivation, shared by the
    * graph-tier oracles below. */
  private[ext] val hostGraphSql: String =
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

  /** [[hostGraphSql]] + all-hosts labeled BFS to 4 hops, ending in CTE
    * `h4` (seed, node, d) — the shared substrate of the q307/q309/q311
    * oracles (the one-shot recompute the incremental form must equal). */
  private[ext] val hostBfs4Sql: String = {
    val rounds = (1 to 4).map(i =>
      s"""h$i AS MATERIALIZED (
         |  SELECT seed, node, MIN(d) AS d FROM (
         |    SELECT seed, node, d FROM h${i - 1}
         |    UNION ALL
         |    SELECT h${i - 1}.seed, sym.dst, h${i - 1}.d + 1
         |    FROM h${i - 1} JOIN sym ON h${i - 1}.node = sym.src) z
         |  GROUP BY seed, node)""".stripMargin).mkString(",\n")
    hostGraphSql +
      s""",
         |h0 AS (SELECT src AS seed, src AS node, 0 AS d
         |       FROM (SELECT DISTINCT src FROM sym)),
         |$rounds""".stripMargin
  }

  /** Seed hosts for the traversal/trust queries: two synthetic hub hosts
    * from the href fixture's 20-host target space. */
  private[ext] val SeedHosts = Seq("h0.example.org", "h1.example.org")
  private[ext] val seedValuesSql: String =
    "(VALUES " + SeedHosts.map(h => s"('$h')").mkString(", ") + ") v(node)"
}
