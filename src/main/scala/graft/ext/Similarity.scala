package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.4).
  *
  * Numeric contract: dot products and norms are LEFT-TO-RIGHT double folds
  * over float32 values (`aggregate`/`zip_with` higher-order functions), which
  * is bit-identical to the DuckDB oracle's list-comprehension sum — so
  * cosine values hash-match without rounding tricks.
  *
  * Scale design: the query set is broadcast; similarity is map-only over the
  * corpus (no shuffle), then top-k reduces per query. The LSH variant
  * bucket-joins 16-bit random-hyperplane signatures instead of scanning, the
  * standard recall/cost trade at 100 TB.
  */
object Similarity {

  /** Sequential double fold of sum(a[i]*b[i]) — matches the oracle exactly.
    * Backed by the codegen'd [[graft.functions.VecDot]] expression (same
    * left-to-right double accumulation, ~30x less per-pair overhead than the
    * HOF formulation on the O(n^2) scans). */
  def dot(a: Column, b: Column): Column = call_function("graft_vec_dot", a, b)

  /** HOF reference formulation of [[dot]] (kept for cross-checking the
    * custom expression in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Corpus with a precomputed norm column (one pass, map-only). */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("nrm", norm(col(vecCol)))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus; per-query top-k via ranking. Output: qid, nid, sim. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("v_c"), col("nrm").as("nrm_c"))
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("v_q"), col("nrm").as("nrm_q"))
    val sims = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-dup
    * detection. Brute-force here; LSH-bucketed at scale (see [[annTopK]]). */
  def cosineNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val n = withNorm(df, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm"))
    n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Multi-table random-hyperplane LSH signatures: `tables` independent
    * `bitsPerTable`-bit signatures, exploded to (table, sig) bucket keys.
    * Hyperplane component (bit j, dim i) is a deterministic ±1 from
    * xxhash64 — no stored planes, pure codegen. */
  def rhpBuckets(vecCol: String, tables: Int = 4, bitsPerTable: Int = 8): Column = expr(
    s"""transform(sequence(0, ${tables - 1}), t -> struct(t as tbl,
       |  aggregate(sequence(t * $bitsPerTable, t * $bitsPerTable + ${bitsPerTable - 1}),
       |            0L, (acc, j) -> acc + if(
       |    aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |                       (x, i) -> cast(x as double) * if((xxhash64(j, i) & 1) = 1, 1.0, -1.0)),
       |              cast(0.0 as double), (a, y) -> a + y) > 0,
       |    shiftleft(cast(1 as bigint), j % $bitsPerTable), 0L)) as sig))""".stripMargin)

  /** LSH-bucketed approximate top-k: candidates share a bucket in at least
    * one of the hash tables; exact cosine re-rank on the (deduplicated)
    * candidate set. Approximate by design (no oracle) — the scale path for
    * ANN: bucket join + per-bucket work instead of a corpus scan per query. */
  def annTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, tables: Int = 4, bitsPerTable: Int = 8): DataFrame = {
    def bucketed(df: DataFrame, id: String) =
      withNorm(df, vecCol)
        .select(col(idCol).as(id), col(vecCol).as(s"v_$id"), col("nrm").as(s"nrm_$id"),
          explode(rhpBuckets(vecCol, tables, bitsPerTable)).as("bucket"))
    val c = bucketed(corpus, "nid")
    val q = bucketed(queries, "qid")
    val candidates = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("v_qid"), col("v_nid"),
        col("nrm_qid"), col("nrm_nid"))
      .dropDuplicates("qid", "nid")
    val sims = candidates.select(col("qid"), col("nid"),
      (dot(col("v_qid"), col("v_nid")) / (col("nrm_qid") * col("nrm_nid"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }
}
