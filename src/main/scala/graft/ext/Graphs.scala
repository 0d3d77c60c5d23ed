package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]): PageRank in EXACT integer arithmetic,
  * so the fixed-iteration result is bit-identical across engines (no
  * float accumulation order, no libm) and the oracle can replay it as
  * chained SQL CTEs.
  *
  * Integer formulation, total mass M (default 10^12):
  * r_0(v) = M div N;  r_{t+1}(v) = (15·(M div N)) div 100
  *   + (85 · Σ_{u→v} (r_t(u) div deg(u))) div 100 — every division a
  * floor on non-negative longs, so engine-order-independent. Overflow
  * bound: 85·Σ ≤ 85·M < 2^63 (ANSI-safe). Mass leaks a few ulps per
  * division (floor), which is fine: ranking order, not a distribution,
  * is the contract.
  *
  * Scale design: one shuffle join (ranks onto the out-edge list) plus one
  * map-side-combinable sum per iteration — the standard Pregel-style
  * plan; per-iteration `localCheckpoint(true)` keeps lineage flat (the
  * [[Dedup.connectedComponents]] idiom). Iterations are a fixed small
  * constant (rank ordering stabilizes long before values converge). */
object Graphs {

  /** PageRank over a directed edge list `(src, dst)` in which EVERY node
    * has in-degree >= 1 (a symmetrized undirected graph qualifies —
    * otherwise in-degree-0 nodes drop out after one iteration). Returns
    * (node, r) after `iters` iterations. */
  def integerPageRank(edges: DataFrame, iters: Int,
      mass: Long = 1000000000000L, eager: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = PinnedCache.pin(edges.join(deg, "src"))
    val n = deg.count()
    require(n > 0, "empty graph")
    val r0 = mass / n
    val base = (15L * r0) / 100L
    // `eager = false` skips the per-round checkpoint so plan audits can see
    // the full iteration lineage; production always checkpoints (flat
    // lineage, each round's shuffle reused, the connectedComponents idiom).
    def flatten(df: DataFrame): DataFrame =
      if (eager) df.localCheckpoint(true) else df
    var ranks = flatten(deg.select(col("src").as("node"), lit(r0).as("r")))
    for (_ <- 1 to iters) {
      ranks = flatten(withDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
        .select(col("node"), (lit(base) + expr("(85 * s) div 100")).as("r")))
    }
    ranks
  }
}
