package graft.ext

import org.apache.spark.sql.functions._
import graft.functions.RhpSig
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Shared oracle-SQL helpers for the north-star query surface (SURVEY.md
  * §2.4). The QueryDefs that used to live here were split along
  * CATALOG.md family lines in round 7 (DedupQueries, SimilarityQueries,
  * TextQueries, SamplingQueries, SketchQueries, GraphQueries,
  * EventQueries, OpsQueries, MultimodalQueries); these `private[ext]`
  * helpers are the LSH/plane/verify CTE fragments those families
  * interpolate into their DuckDB oracles. */
object Ext {

  /** RHP-LSH parameters for the embedding near-dup/dedup queries, shared by
    * the Spark plan AND the DuckDB oracle (the +-1 plane signs are
    * interpolated into the SQL as literals, so both engines compute the
    * exact same bucket assignments — the oracle checks the BUCKETED
    * semantics, not a brute-force approximation of them). */
  private[ext] val LshTables = 32
  private[ext] val LshBits = 5
  /** q30 ANN parameters (annTopK defaults): fewer bits per table than the
    * near-dup queries — ANN wants higher recall per table at the cost of
    * bigger buckets, the re-rank is per-query top-k, not all pairs. */
  private[ext] val AnnTables = 32
  private[ext] val AnnBits = 4
  private[ext] val EmbDim = 64
  /** q96/q97 hot-bucket cap, chosen to FIRE on the test corpus (RHP bits=5
    * buckets average |corpus|/32 ≈ 15 members at sf0.01) so the guard's
    * degraded semantics are exercised under oracle — production uses
    * [[Dedup.DefaultMaxBucketSize]]. */
  private[ext] val GuardCap = 20

  /** DuckDB SQL replica of [[TextAnalysis.quarterLog2]] over an integer
    * sub-expression `c` (token for token with the Column form; see q105's
    * oracle for the inline original). */
  private[ext] def qlog4Sql(c: String): String =
    s"""CASE WHEN length(bin($c)) - 1 <= 14
       |    THEN length(bin(($c)*($c)*($c)*($c))) - 1
       |    ELSE 4 * (length(bin($c)) - 15) +
       |         length(bin((($c) >> (length(bin($c)) - 15))
       |                   *(($c) >> (length(bin($c)) - 15))
       |                   *(($c) >> (length(bin($c)) - 15))
       |                   *(($c) >> (length(bin($c)) - 15)))) - 1 END""".stripMargin

  /** `(p, [s1,...,s64])` rows for the oracle's planes relation — generated
    * from the same [[RhpSig.planeSign]] the codegen expression uses. */
  private[ext] def planesValuesSql(nPlanes: Int): String =
    (0 until nPlanes).map { p =>
      s"($p, [${(0 until EmbDim).map(i => RhpSig.planeSign(p, i)).mkString(",")}])"
    }.mkString(", ")

  /** Oracle CTEs `planes` + `sig`: the (tbl, sig) RHP bucket assignment of
    * every embedding, replicating [[Similarity.rhpBuckets]] bit-for-bit
    * (interpolated plane sign literals, LshTables × LshBits family). */
  private[ext] def sigCtesSql: String =
    s"""planes(p, s) AS (SELECT * FROM (VALUES ${planesValuesSql(LshTables * LshBits)}) v(p, s)),
       |sig AS (
       |  SELECT e.vec_id, pl.p // $LshBits AS tbl,
       |    SUM(CASE WHEN list_sum([CAST(e.embedding[i] AS DOUBLE) * pl.s[i]
       |                            FOR i IN generate_series(1, len(e.embedding))]) > 0
       |             THEN (1::BIGINT << (pl.p % $LshBits)) ELSE 0::BIGINT END) AS sig
       |  FROM embeddings e, planes pl
       |  GROUP BY e.vec_id, pl.p // $LshBits)""".stripMargin

  /** Oracle CTEs `n` + `verified`: exact-cosine verification (>= 0.4) over
    * whatever `cand(a_id, b_id)` CTE precedes them. */
  private[ext] def verifyCtesSql: String =
    s"""n AS (
       |  SELECT vec_id, label, embedding,
       |    sqrt(list_sum([CAST(embedding[i] AS DOUBLE)*embedding[i]
       |                   FOR i IN generate_series(1,len(embedding))])) AS nrm
       |  FROM embeddings),
       |verified AS (
       |  SELECT a_id, b_id, cos_sim FROM (
       |    SELECT c.a_id, c.b_id,
       |      list_sum([CAST(na.embedding[i] AS DOUBLE)*nb.embedding[i]
       |                FOR i IN generate_series(1,len(na.embedding))])/(na.nrm*nb.nrm) AS cos_sim
       |    FROM cand c
       |    JOIN n na ON na.vec_id = c.a_id
       |    JOIN n nb ON nb.vec_id = c.b_id)
       |  WHERE cos_sim >= 0.4)""".stripMargin

  /** Shared oracle CTEs: bucket signatures, distinct within-bucket candidate
    * pairs, and exact verification — the SQL replica of
    * [[Similarity.cosineNearDupPairsLsh]]'s (unguarded) bucketing. */
  private[ext] def lshCtesSql: String =
    s"""$sigCtesSql,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM sig a JOIN sig b
       |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id),
       |$verifyCtesSql""".stripMargin
}
