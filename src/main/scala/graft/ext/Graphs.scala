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

  /** DISTINCT co-occurrence pairs (a < b) of items sharing a basket — the
    * co-purchase / co-occurrence edge derivation shared by the graph-tier
    * queries (q139/q148/q183/q313/q337/q345/q346 and the basket miners).
    *
    * Single-shuffle shape (optimization guide §2.3 "aggregate before you
    * shuffle" + §2.4 "remove shuffles outright"): ONE hash exchange of the
    * (basket, item) rows builds each basket's sorted distinct item array
    * (per-group state O(basket size)), pairs expand IN-PARTITION from the
    * sorted array, and the same global distinct as before closes it. The
    * self-join formulation this replaces scanned the input twice and
    * exchanged it twice (both join sides) before the identical distinct.
    * Pair VOLUME is unchanged — Σ C(k, 2) either way, and a mega-basket
    * blows up both formulations identically (cap upstream where basket
    * sizes are unbounded; TPC-H orders are ≤ 7 lineitems); what changes
    * is input-exchange count (2 → 1) and the join machinery (gone).
    * Output sets are IDENTICAL: pairs (x, y), x < y, of distinct items
    * within a basket — sort_array + (i < j) expansion enumerates exactly
    * the x < y pairs the join's `x.pk < y.pk` predicate kept. */
  def basketPairs(items: DataFrame): DataFrame =
    basketPairsPerBasket(items)
      .select(col("p1").as("a"), col("p2").as("b")).distinct()

  /** Per-basket variant of [[basketPairs]]: (ok, p1 < p2) with one row per
    * (basket, pair) — the support-counting shape of the basket miners
    * (q176/q177). Input rows are deduplicated per basket first (the
    * self-join formulation operated on distinct (ok, pk) rows too).
    *
    * `maxBasketSize` is a MEMORY GUARD, not a tuning knob: the expansion
    * materializes all C(k, 2) pair structs of a basket inside one row
    * before the explode, so an unbounded mega-basket concentrates O(k²)
    * bytes in one task where the old self-join streamed (ADVICE r14).
    * A basket above the cap fails LOUDLY (assert_true names the basket)
    * instead of OOM-ing the executor; callers with genuinely huge
    * baskets must cap upstream (the capAdjacency discipline). 10⁴ items
    * ⇒ ~5·10⁷ pair structs ≈ the practical single-task ceiling; every
    * basket family in this repo is orders of magnitude below it. */
  def basketPairsPerBasket(items: DataFrame,
      maxBasketSize: Int = 10000): DataFrame =
    items.toDF("ok", "pk")
      .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("s"))
      .where(coalesce(expr(
        s"""assert_true(size(s) <= $maxBasketSize,
           |  concat('basketPairsPerBasket: basket ', cast(ok as string),
           |         ' has ', cast(size(s) as string),
           |         ' items > maxBasketSize $maxBasketSize — cap upstream'))"""
          .stripMargin), lit(true)))
      .select(col("ok"), explode(expr(
        """flatten(transform(s, (x, i) ->
          |  transform(slice(s, i + 2, size(s) - i - 1),
          |            y -> named_struct('p1', x, 'p2', y))))""".stripMargin)).as("p"))
      .select(col("ok"), col("p.p1").as("p1"), col("p.p2").as("p2"))

  /** PageRank over a directed edge list `(src, dst)` in which EVERY node
    * has in-degree >= 1 (a symmetrized undirected graph qualifies —
    * otherwise in-degree-0 nodes drop out after one iteration). Returns
    * (node, r) after `iters` iterations. */
  def integerPageRank(edges: DataFrame, iters: Int,
      mass: Long = 1000000000000L, eager: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    // pin the caller's edge frame: deg and withDeg both consume it, and
    // callers often pass a join+distinct pipeline that must not run twice
    val e = PinnedCache.pin(edges)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // withDeg is joined on src once per iteration; when the deg join
    // broadcasts, its output carries NO useful partitioning, so every
    // iteration re-exchanged the static edge frame. One explicit
    // hash-partition before the pin lets all `iters` joins reuse it
    // (guide §2.4; the labelPropagation idiom). Size-gated like
    // [[pinLadderEdges]]: tiny graphs broadcast per-iteration anyway and
    // the upfront exchange would be pure overhead.
    val withDeg0 = e.join(deg, "src")
    val withDeg = PinnedCache.pin(
      if (e.count() >= 32768L) withDeg0.repartition(col("src")) else withDeg0)
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

  /** Fixed-round k-core peeling over an undirected edge list `(a, b)`
    * (a < b, deduplicated): `rounds` iterations of "drop every node whose
    * current degree is < k, and all its edges". Returns the surviving
    * subgraph's (node, deg). The contract is the exact result of `rounds`
    * peels (the [[integerPageRank]] fixed-iteration pattern — run enough
    * rounds and it IS the k-core, but determinism never depends on
    * convergence detection).
    *
    * Each round is one map-side-combinable degree count + two semi-joins —
    * Pregel-shaped, `localCheckpoint` keeps lineage flat. Dense-subgraph
    * mining over dup/co-occurrence graphs: the k-core is the standard
    * pre-filter before clique-ish analysis (triangles, [[triangleCounts]])
    * because it provably contains every subgraph of min-degree k while
    * being computable in linear rounds. */
  /** (node, deg) over an undirected `(a, b)` edge frame. */
  private def undirDegrees(df: DataFrame): DataFrame =
    df.select(col("a").as("node")).unionAll(df.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** [[kCorePeel]]'s surviving EDGE set after `rounds` peels — exposed so
    * incremental maintenance ([[incrementalKCorePeel]]) can carry the
    * edge state forward between waves (degrees alone don't determine the
    * next peel). */
  def kCorePeelEdges(edges: DataFrame, k: Int, rounds: Int,
      eager: Boolean = true): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 50, "k >= 1, rounds in [1,50]")
    def flatten(df: DataFrame): DataFrame =
      if (eager) df.localCheckpoint(true) else df
    // materialize the input once: round 1 reads it three times (degree
    // count + both semi-joins), and callers pass join+distinct pipelines
    var e = flatten(edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b")))
    for (_ <- 1 to rounds) {
      val keep = undirDegrees(e).where(col("deg") >= k).select(col("node"))
      e = flatten(e
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi"))
    }
    // USING-joins front their key, so the loop leaves columns as (b, a);
    // restore the (a, b) contract for edge-set consumers
    e.select(col("a"), col("b"))
  }

  def kCorePeel(edges: DataFrame, k: Int, rounds: Int,
      eager: Boolean = true): DataFrame =
    undirDegrees(kCorePeelEdges(edges, k, rounds, eager))

  /** INCREMENTAL k-core peel — the fourth graph tier's maintained form,
    * closing the incremental family (connectivity q164, communities
    * q253, authority q304, cohesion q306, density: this): given the base
    * graph's surviving edge set (= [[kCorePeelEdges]](base, k, rounds))
    * and a DISJOINT `deltaEdges` wave (undirected `(a, b)`, a < b,
    * deduplicated, base ∩ delta = ∅), produce survivor degrees IDENTICAL
    * to re-running [[kCorePeel]] over base ∪ delta, re-peeling only the
    * delta's neighborhood.
    *
    * Exactness argument (fixed `rounds` = R): define an edge's distance
    * as the min hop distance of its endpoints to a delta endpoint in the
    * union graph. Round-1 keep-degrees differ from the base run only at
    * delta endpoints (dist 0), so round-1 edge survival changes only for
    * dist-0 edges; inductively, round-r survival changes only for edges
    * of dist ≤ r−1, so edges with dist ≥ R keep their base survival
    * VERBATIM (the pass-through anti-join). For the dist ≤ R−1 edges,
    * the same peel recurrence runs on the union subgraph induced by the
    * 2R-hop ball: a taken edge's endpoints sit at dist ≤ R, their
    * round-R survival depends on neighborhoods to dist ≤ 2R−1 — all
    * fully present — and the only corruption (round-1 degree undercount
    * of dist-2R boundary nodes, whose ball-external edges are cut)
    * propagates one hop per round, reaching dist 2R − (R−1) = R+1 > R
    * after R rounds: never a taken endpoint. No approximation anywhere;
    * IncrementalKCoreSpec pins equality against the one-shot batch run
    * (random waves, a rescue-cascade chain, new-node deltas, dag-cycle
    * maintenance).
    *
    * Scale shape: the ball grows by frontier joins (bfsDistances' plan,
    * cost ∝ touched region); the re-peel shuffles ball-incident edges
    * only. Edge additions can only RESCUE nodes from peeling (degrees
    * grow), so nightly dup-graph maintenance touches the delta's
    * neighborhood, not the corpus. */
  def incrementalKCorePeel(prevSurviving: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, k: Int, rounds: Int): DataFrame =
    undirDegrees(incrementalKCorePeelEdges(
      prevSurviving, baseEdges, deltaEdges, k, rounds))

  /** [[incrementalKCorePeel]]'s surviving EDGE set — what a maintenance
    * loop carries into the next wave as `prevSurviving`. */
  def incrementalKCorePeelEdges(prevSurviving: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 10, "k >= 1, rounds in [1,10]")
    def norm(df: DataFrame) = df.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val bE = norm(baseEdges)
    val dE = norm(deltaEdges)
    // eager localCheckpoints (not just pins) — nbrs feeds every one of
    // the 2R ball rounds and all feeds nbrs + the induced subgraph, so
    // without a lineage cut each reference re-embeds the caller's whole
    // pair-pipeline plan (the incrementalTriangleCounts lesson)
    val all = bE.unionByName(dE).localCheckpoint(true)
    val nbrs = all.select(col("a").as("u"), col("b").as("w"))
      .unionByName(all.select(col("b").as("u"), col("a").as("w")))
      .localCheckpoint(true)
    val seeds = dE.select(col("a").as("node"))
      .unionByName(dE.select(col("b").as("node"))).distinct()
    // node distances to the nearest delta endpoint, up to 2R hops
    var ball = seeds.withColumn("d", lit(0L)).localCheckpoint(true)
    for (i <- 1 to 2 * rounds) {
      val frontier = ball.where(col("d") === (i - 1).toLong)
        .select(col("node").as("u"))
      ball = ball.unionByName(
          nbrs.join(frontier, "u").select(col("w").as("node"), lit(i.toLong).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val ballAll = ball.select(col("node"))
    // taken edges: dist ≤ R−1 ⟺ either endpoint within R−1 hops
    val takeN = ball.where(col("d") <= (rounds - 1).toLong)
      .select(col("node")).localCheckpoint(true)
    // re-select (a, b): the USING-joins front their key, and the batch
    // operator renames POSITIONALLY via toDF
    val sub = all
      .join(ballAll.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(ballAll.select(col("node").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
    val subSurv = kCorePeelEdges(sub, k, rounds)
    val recomputed = subSurv
      .join(takeN.select(col("node").as("a")), Seq("a"), "left_semi")
      .unionByName(subSurv
        .join(takeN.select(col("node").as("b")), Seq("b"), "left_semi"))
      .distinct()
    val passThrough = norm(prevSurviving)
      .join(takeN.select(col("node").as("a")), Seq("a"), "left_anti")
      .join(takeN.select(col("node").as("b")), Seq("b"), "left_anti")
    // (a, b) order restored — the USING-joins above front their key
    passThrough.unionByName(recomputed).select(col("a"), col("b"))
  }

  /** Exact per-node triangle counts + local clustering coefficients over an
    * undirected edge list `(a, b)` (one row per edge, `a < b`, no
    * duplicates). Returns `(node, deg, tri, lcc_ppm)` where `lcc_ppm` is
    * the local clustering coefficient 2·tri / (deg·(deg−1)) in EXACT
    * integer ppm (floor of ×10^6) — no float division, engine-portable.
    *
    * Algorithm: degree-ordered edge orientation ("compact-forward" /
    * node-iterator++). Every edge points from its lower endpoint to its
    * higher endpoint in the total order (deg(v), v); a triangle {u,v,w}
    * with u <_T v <_T w is enumerated exactly once as the wedge
    * (u→v, u→w) closed by the oriented edge v→w. Orientation bounds every
    * node's out-degree by O(√m), so the wedge join generates O(m^{3/2})
    * candidates worst-case — the standard scalable bound — instead of the
    * Σ deg² of naive wedge counting; a hub with degree 10^6 in a 100 TB
    * similarity graph contributes only its out-degree² ≈ m wedges, not
    * 10^12. All shuffles key on node ids; the closing probe is an equi
    * semi-join on (v, w). No driver-side state.
    *
    * The order key packs (deg, node) into one long — `deg·2^32 + node` —
    * so the wedge inequality is a single long comparison; requires
    * node < 2^32 and deg < 2^30 (any id space can be dense-ranked into
    * this range first).
    *
    * Training-pipeline use: dup-graph densification audit. A near-dup pair
    * list (q26/q104) with chain-shaped components (low lcc) signals
    * transitive false-positive merges; dense true-dup clusters sit near
    * lcc = 10^6. Also the market-basket / co-occurrence shape (q139 runs
    * it over part co-purchases). */
  def triangleCounts(edges: DataFrame, peelRounds: Int = 0): DataFrame = {
    require(peelRounds >= 0 && peelRounds <= 10, "peelRounds in [0,10]")
    // pinned: consumed by deg AND the orientation join; deg pinned too
    // (ord + the final coefficient join) — without these the caller's
    // edge-generation pipeline executes three times
    val e = PinnedCache.pin(edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b")))
    def degrees(df: DataFrame): DataFrame =
      df.select(col("a").as("node")).unionAll(df.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val deg = PinnedCache.pin(degrees(e))
    // Optional k=2 pre-peel before orientation: a degree-1 node can't
    // close a wedge, and every triangle vertex keeps degree >= 2 inside
    // its own triangle, so any number of peel rounds preserves the
    // triangle set EXACTLY (GraphsSpec pins rounds 0 == 2 bit-identical).
    // Output degrees/lcc stay on the ORIGINAL graph; peeled nodes fall
    // out of perNode and coalesce to tri = 0. Default 0: each round costs
    // a degree count + two semi-joins + a checkpoint (~2 s on q139's
    // 1.2M-edge graph, measured), which only pays on graphs with a real
    // degree-1 tail — q139's co-purchase graph has ZERO degree-1 nodes at
    // sf0.1, so the query keeps the peel off; dup-graphs with tendrils
    // should pass peelRounds = 2.
    var pe = e
    for (_ <- 1 to peelRounds) {
      val keep = degrees(pe).where(col("deg") >= 2).select(col("node"))
      pe = pe
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }
    // orientation order uses the PEELED degrees (any total order is
    // correct; the peeled one gives the tighter O(sqrt(m)) out-degree);
    // with no peel, pe == e so the PINNED deg frame is reused instead of
    // re-running the union+aggregate over 2|E| rows (guide §2.4)
    val ord = (if (peelRounds == 0) deg else degrees(pe))
      .select(col("node"), (col("deg") * 4294967296L + col("node")).as("ord"))
    val oriented = PinnedCache.pin(pe
      .join(ord.select(col("node").as("a"), col("ord").as("oa")), "a")
      .join(ord.select(col("node").as("b"), col("ord").as("ob")), "b")
      .select(
        when(col("oa") < col("ob"), col("a")).otherwise(col("b")).as("src"),
        when(col("oa") < col("ob"), col("b")).otherwise(col("a")).as("dst"),
        greatest(col("oa"), col("ob")).as("dord")))
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dord") < col("e2.dord"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"),
        "left_semi")
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_ppm",
        when(col("deg") >= 2,
          expr("cast((cast(tri as decimal(38,0)) * 2000000)" +
            " div (cast(deg as decimal(38,0)) * (deg - 1)) as bigint)"))
          .otherwise(lit(0L)))
  }

  /** GLOBAL TRANSITIVITY — the one-row sibling of [[triangleCounts]]'
    * per-node lcc: 3·triangles / wedges = Σ_v tri(v) / Σ_v C(deg(v), 2),
    * exact rational in integer ppm (both sums ride decimal(38,0); one
    * non-negative floor division — transitivity ∈ [0, 1]). The
    * clustering readout a dup-graph audit reads FIRST (is the pair list
    * clique-like or chain-like overall?) before drilling into per-node
    * lcc. A wedge-free graph (every degree ≤ 1) raises loudly —
    * transitivity is undefined there. Cost: one [[triangleCounts]] pass
    * + a 1-row rollup. */
  def globalTransitivity(edges: DataFrame): DataFrame =
    transitivityReadout(triangleCounts(edges))

  /** The two decimal-rail sums behind [[globalTransitivity]], over any
    * (node, deg, tri, …) frame — shared with the maintained form. */
  private def transitivityReadout(perNode: DataFrame): DataFrame = perNode
    .agg(coalesce(sum(col("tri").cast("decimal(38,0)")),
      lit(0L).cast("decimal(38,0)")).as("tri3"), // = 3 * triangles
      coalesce(sum(col("deg").cast("decimal(38,0)") * (col("deg") - 1)),
        lit(0L).cast("decimal(38,0)")).as("w2")) // = 2 * wedges
    .select(expr("tri3 div 3").as("n_triangles"), // div on decimal → bigint
      expr("""case when w2 = 0 then
              |  cast(raise_error('globalTransitivity: no wedges (max degree <= 1) — undefined') as bigint)
              |else (2 * tri3 * 1000000) div w2
              |end""".stripMargin).as("transitivity_ppm"))

  /** INCREMENTAL [[globalTransitivity]] — the SIXTEENTH maintained form,
    * by pure COMPOSITION: [[incrementalTriangleCounts]] already
    * maintains the per-node (deg, tri) frame proven ≡ the batch
    * recount, and the transitivity readout is two sums over exactly
    * that frame — so maintained-readout ≡ batch-readout follows with NO
    * new exactness argument (the composition discipline of the q335
    * Girvan-Newman split). Inherits the triangle form's contract:
    * canonical a < b edges, delta disjoint from base. */
  def incrementalTransitivity(prevCounts: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame): DataFrame =
    transitivityReadout(
      incrementalTriangleCounts(prevCounts, baseEdges, deltaEdges))

  // ----------------------------------------------------------- butterflies

  /** Butterfly (2×2-biclique) co-pair frame of a BIPARTITE edge set
    * (l, r) — the bipartite analog of the triangle machinery: a
    * butterfly is two left vertices sharing two right vertices, THE
    * cohesion primitive of user-item / order-part / doc-shingle graphs,
    * where triangles cannot exist. Per-left wedges: every left vertex
    * with edges to r1 < r2 contributes one wedge to co-pair (r1, r2);
    * with w(r1, r2) the wedge count, butterflies = Σ C(w, 2). This
    * method returns the (r1, r2, w) co-pair frame — the co-occurrence
    * index (q86's copurchase shape, un-thresholded) and the MAINTAINED
    * STATE of [[incrementalButterflyCopairs]]; [[butterflyCount]] is
    * the 1-row census readout.
    *
    * Scale shape: ONE self-equi-join on l + one (r1, r2) rollup —
    * wedge volume Σ_l deg(l)², so orient the small-degree side LEFT
    * (orders with ~4 parts each, not parts in ~10⁶ orders);
    * [[capAdjacency]] is the documented pre-step when left degrees are
    * skewed. Partial aggregation absorbs the wedge stream map-side;
    * nothing ever materializes the butterfly set itself. */
  def butterflyCopairs(edges: DataFrame): DataFrame = {
    val e = edges.toDF("l", "r")
      .select(col("l").cast("long").as("l"), col("r").cast("long").as("r"))
    e.as("x").join(e.as("y"),
        col("x.l") === col("y.l") && col("x.r") < col("y.r"))
      .groupBy(col("x.r").as("r1"), col("y.r").as("r2"))
      .agg(count(lit(1)).as("w"))
  }

  /** 1-row butterfly census over a [[butterflyCopairs]] frame: total
    * wedges, distinct co-pairs, butterflies = Σ w(w−1)/2. Sums ride
    * decimal(38,0) (w can reach the left-vertex count, so Σ w² can pass
    * 2^63 long before any count does); the final casts to long are
    * ANSI — overflow past 2^63 raises loudly rather than wrapping. */
  def butterflyReadout(copairs: DataFrame): DataFrame = copairs
    .agg(coalesce(sum(col("w").cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)")).as("wsum"),
      count(lit(1)).as("co_pairs"),
      coalesce(sum(col("w").cast("decimal(38,0)") * (col("w") - 1)),
        lit(0L).cast("decimal(38,0)")).as("b2"))
    .select(col("wsum").cast("long").as("wedges"), col("co_pairs"),
      expr("b2 div 2").cast("long").as("butterflies"))

  /** Butterfly census of a bipartite (l, r) edge set — see
    * [[butterflyCopairs]] for the method and scale shape. */
  def butterflyCount(edges: DataFrame): DataFrame =
    butterflyReadout(butterflyCopairs(edges))

  /** Per-RIGHT-vertex butterfly participation over a
    * [[butterflyCopairs]] frame: for each right vertex r, the partners
    * it shares ≥1 left vertex with, its wedge mass Σ w(r, ·), and the
    * butterflies it sits in Σ_partners C(w, 2) — the bipartite
    * centrality that ranks parts/items by embeddedness in 2×2 cohesion
    * (a hub with many one-off co-occurrences ranks BELOW a part in a
    * tight repeated bundle). One explode-both-ends union + one r-keyed
    * rollup over the co-pair frame — reuses the maintained state of
    * [[incrementalButterflyCopairs]], so a nightly pipeline gets this
    * readout for the cost of a rollup. Decimal rails on both sums. */
  def butterflyParticipation(copairs: DataFrame): DataFrame = {
    val p = copairs.toDF("r1", "r2", "w")
    p.select(col("r1").as("r"), col("w"))
      .unionByName(p.select(col("r2").as("r"), col("w")))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("partners"),
        sum(col("w").cast("decimal(38,0)")).as("wsum"),
        sum(col("w").cast("decimal(38,0)") * (col("w") - 1)).as("b2"))
      .select(col("r"), col("partners"),
        col("wsum").cast("long").as("wedges"),
        expr("b2 div 2").cast("long").as("butterflies"))
  }

  // -------------------------------------------------------------- HyperANF

  /** Per-V linear-counting estimates in MILLI-units: floor(1000 · m ·
    * ln(m/V)) for V = 1..64, precomputed ONCE in Scala so the Spark
    * plan and the generated oracle SQL carry the SAME integer literals
    * — ln never executes in either engine. */
  private[ext] val hyperAnfLinMilli: Seq[(Int, Long)] = (1 to 64).map(v =>
    v -> math.floor(1000.0 * 64.0 * math.log(64.0 / v)).toLong)

  /** HyperANF neighborhood function — the 100 TB-SCALE twin of q309's
    * EXACT distance histogram (whose all-seeds MS-BFS holds seeds ×
    * nodes state): each node carries a 64-register HLL of its t-ball,
    * one register-max merge along edges per round, so state is nodes ×
    * ≤64 small ints FOREVER and a round is ONE equi-join + ONE
    * (node, bucket) max rollup — partial-agg absorbed map-side, cost
    * ∝ edges · occupied-registers, never pairs. The same portable
    * md5-register family as q133 ([[Sketches.hllRho]]), so the oracle
    * replays every register bit.
    *
    * Readout per round, from the SPARSE frame (absent bucket ⇒ m = 0,
    * so s_sum = Σ 2^(55−m) + (64 − occupied)·2^55 — no dense fill):
    * per-node ball-size estimate in milli-units — the HLL raw
    * estimate (the q133 literal fold, floored) when all 64 registers
    * are hit, linear counting m·ln(m/V) via the PRECOMPUTED integer
    * table [[hyperAnfLinMilli]] otherwise (ln never runs in-engine) —
    * then ONE integer sum: N(t) ≈ Σ_v |B(v, t)|. Estimates are
    * approximate (±~13 % at m = 64, the operator's honest contract —
    * q309 is the exact path when seeds × nodes fits); every BIT is
    * deterministic and oracle-replayable. HyperAnfSpec additionally
    * pins register-set ≡ registers-of-the-exact-ball per node.
    * Output: (t, n_nodes, n_saturated, sum_est_milli), t = 1..rounds. */
  /** `inputSymmetric = true` asserts `edges` is ALREADY the symmetric
    * deduplicated frame (both orientations present, distinct — the
    * [[ExtraQueries.hostLinkGraph]] contract): the symmetrize-then-
    * distinct pass is skipped outright — double-symmetrizing an already
    * symmetric frame costs a full 2|E|-row exchange to dedup right back
    * to the input (guide §2.4). */
  def hyperAnf(edges: DataFrame, rounds: Int = 3,
      inputSymmetric: Boolean = false): DataFrame =
    hyperAnfFromTrace(hyperAnfTrace(edges, rounds, inputSymmetric))

  /** Symmetrized, self-loop-free, deduplicated edge frame — the graph
    * both HyperANF paths propagate along. */
  private def hyperAnfSym(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b")).distinct()
  }

  /** Fresh singleton registers for a node frame (`node` column). */
  private def hyperAnfSeed(nodes: DataFrame): DataFrame = {
    val h = Sampling.portableHash(col("node"))
    nodes.select(col("node"), pmod(h, lit(64L)).as("bucket"),
      Sketches.hllRho(h).as("m"))
  }

  /** One propagation step: every node receives its neighbors' registers
    * (receiver `a` ← sender `b` along the symmetric edge frame). */
  private def hyperAnfPropagate(sym: DataFrame, regs: DataFrame): DataFrame =
    sym.join(regs.withColumnRenamed("node", "b"), "b")
      .select(col("a").as("node"), col("bucket"), col("m"))

  /** The HyperANF register TRACE — regs after round 0 (singletons) ..
    * round `rounds`, each frame (node, bucket, m) checkpointed. This IS
    * the maintained state of [[incrementalHyperAnfTrace]]: at 100 TB
    * the trace is the artifact a nightly persists (nodes × ≤64 small
    * ints per round) so the next delta never re-propagates the whole
    * graph. */
  def hyperAnfTrace(edges: DataFrame, rounds: Int = 3,
      inputSymmetric: Boolean = false): Seq[DataFrame] = {
    require(rounds >= 1 && rounds <= 6, "rounds in [1,6]")
    val sym = (if (inputSymmetric)
        edges.toDF("a", "b").where(col("a") =!= col("b"))
      else hyperAnfSym(edges)).localCheckpoint(true)
    var regs = hyperAnfSeed(sym.select(col("a").as("node")).distinct())
      .localCheckpoint(true)
    regs +: (1 to rounds).map { _ =>
      regs = regs.unionByName(hyperAnfPropagate(sym, regs))
        .groupBy(col("node"), col("bucket")).agg(max(col("m")).as("m"))
        .localCheckpoint(true)
      regs
    }
  }

  /** Per-node ball estimate over one register frame: (node, v_zero,
    * est_milli) — linear counting via the precomputed table while any
    * register is empty, the q133 raw-estimate literal fold once all 64
    * are hit. Shared by the one-shot and maintained readouts (the
    * q367/q369 oracles replay it bit for bit). */
  private def hyperAnfNodeEst(regs: DataFrame): DataFrame = {
    val linMap = typedLit(hyperAnfLinMilli.toMap)
    regs.groupBy(col("node"))
      .agg(count(lit(1)).as("occ"),
        sum(expr("shiftleft(1L, 55 - m)")).as("s_occ"))
      .select(col("node"), (lit(64L) - col("occ")).as("v_zero"),
        (col("s_occ") + (lit(64L) - col("occ")) * expr("shiftleft(1L, 55)"))
          .as("s_sum"))
      .select(col("node"), col("v_zero"),
        when(col("v_zero") > 0,
          element_at(linMap, col("v_zero").cast("int")))
          .otherwise(floor(lit(1000.0) *
            (lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
              col("s_sum").cast("double"))).cast("long")).as("est_milli"))
  }

  /** The q367 output read off a register trace: one census row per
    * round t = 1..R. */
  def hyperAnfFromTrace(trace: Seq[DataFrame]): DataFrame =
    trace.tail.zipWithIndex.map { case (regs, i) =>
      hyperAnfNodeEst(regs)
        .agg(count(lit(1)).as("n_nodes"),
          sum(when(col("v_zero") === 0, 1L).otherwise(0L)).as("n_saturated"),
          sum(col("est_milli")).as("sum_est_milli"))
        .select(lit(i + 1).as("t"), col("n_nodes"), col("n_saturated"),
          col("sum_est_milli"))
    }.reduce(_.unionByName(_)).orderBy(col("t"))

  /** INCREMENTAL HyperANF — the EIGHTEENTH maintained form: update the
    * register trace for a DISJOINT edge delta by propagating register
    * DIFFS, never re-running the R rounds over the whole graph.
    *
    * Exactness (induction over rounds): write the new round-k frame as
    * regs'_k = merge(regs_k, d_k) with d_k = entries strictly above
    * the stored trace. The batch recurrence regs'_k =
    * merge(regs'_{k−1}, P_new(regs'_{k−1})) expands, using P_new =
    * P_base ∪ P_delta and merge(regs_{k−1}, P_base(regs_{k−1})) =
    * regs_k (the stored trace), to
    *   regs'_k = merge(regs_k, d_{k−1}, P_base(d_{k−1}),
    *                   P_delta(regs'_{k−1})),
    * so the only NEW mass each round flows from (a) the previous
    * round's diffs through base edges, (b) the previous full frame
    * restricted to DELTA ENDPOINTS through delta edges, (c) brand-new
    * nodes' singletons (the round-0 diff). Register max is an
    * idempotent commutative monoid, so merging candidates that turn
    * out not to exceed the trace is harmless — d_k is re-derived by
    * comparison against the stored round-k frame, which also retires
    * diffs the base graph catches up to one round later.
    *
    * Scale shape: every candidate frame is DIFF/ball-sized (broadcast-
    * hinted when small); the stored trace is only SCANNED — semi-joined
    * down to delta endpoints for (b) and left-joined against
    * candidate-keyed diffs for the comparison — never exchanged. The
    * returned trace shares every untouched register row with the input
    * verbatim (merge is a ball-sized full-outer per round).
    * Contract: delta disjoint from base, both deduplicated undirected
    * pairs. IncrementalHyperAnfSpec pins trace ≡ batch per round
    * across schedules; [[hyperAnfFromTrace]] over the result ≡ the
    * one-shot census (the q369 oracle). */
  def incrementalHyperAnfTrace(trace: Seq[DataFrame], baseEdges: DataFrame,
      deltaEdges: DataFrame): Seq[DataFrame] = {
    val rounds = trace.size - 1
    require(rounds >= 1, "trace must hold round 0 plus >= 1 round")
    // the maintained-form contract (deduplicated canonical pairs, like
    // every incremental operator here) lets base symmetrize WITHOUT the
    // distinct — map-side only, so the repeated per-round uses never
    // exchange the graph (hyperAnfSym's dedup would re-shuffle all of
    // base on every action; measured 2/3 of the maintenance bytes)
    val eB = baseEdges.toDF("a", "b")
    val symB = eB
      .unionByName(eB.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b"))
    val symD = hyperAnfSym(deltaEdges).localCheckpoint(true)
    val hint = frontierHinter(symB)
    val dEnds = symD.select(col("a").as("node")).distinct().localCheckpoint(true)
    def norm(df: DataFrame) = df.toDF("node", "bucket", "m")
    // round-0 diff: singletons of nodes the base graph has never seen.
    // Membership against the node-sized trace head goes semi-then-anti
    // (scan the trace, broadcast only dEnds-sized frames) — a direct
    // anti-join would exchange the whole node universe
    val knownEnds = norm(trace.head).select(col("node"))
      .join(hint(dEnds), Seq("node"), "left_semi").distinct()
    val newNodes = dEnds.join(hint(knownEnds), Seq("node"), "left_anti")
    var d = hyperAnfSeed(newNodes).localCheckpoint(true)
    val newTrace = Seq(trace.head.unionByName(d).localCheckpoint(true)) ++
      (1 to rounds).map { k =>
        // regs'_{k-1} at delta endpoints = merge(trace(k-1)|dEnds, d|dEnds)
        val primeAtEnds = norm(trace(k - 1))
          .join(hint(dEnds), Seq("node"), "left_semi")
          .unionByName(d.join(hint(dEnds), Seq("node"), "left_semi"))
        val cand = d
          .unionByName(hyperAnfPropagate(symB, hint(d)))
          .unionByName(hyperAnfPropagate(symD, primeAtEnds))
          .groupBy(col("node"), col("bucket")).agg(max(col("m")).as("m"))
          .localCheckpoint(true)
        // compare against the stored round-k frame WITHOUT exchanging it:
        // restrict the trace to candidate keys by broadcast semi-join
        // (scan-only), then broadcast the restricted side into the left
        // join — a direct left join would SortMergeJoin the node-sized
        // checkpoint-blinded trace (the r13 lesson)
        val traceAtCand = norm(trace(k))
          .join(hint(cand.select(col("node"), col("bucket"))),
            Seq("node", "bucket"), "left_semi")
        d = cand
          .join(hint(traceAtCand.withColumnRenamed("m", "old_m")),
            Seq("node", "bucket"), "left")
          .where(col("old_m").isNull || col("m") > col("old_m"))
          .select(col("node"), col("bucket"), col("m"))
          .localCheckpoint(true)
        // merged round-k frame: untouched rows verbatim via a broadcast
        // ANTI-join (d.m > old m by construction, so d rows override) —
        // a full-outer here would SortMergeJoin and exchange the
        // node-sized trace, the exact shape the r13 reshape removed
        norm(trace(k))
          .join(hint(d), Seq("node", "bucket"), "left_anti")
          .unionByName(d)
          .localCheckpoint(true)
      }
    newTrace
  }

  /** INCREMENTAL butterflies — the SEVENTEENTH maintained form. State =
    * the co-pair frame w(r1, r2) ([[butterflyCopairs]]) — the
    * co-occurrence index a recommendation / co-cite pipeline maintains
    * anyway. A DISJOINT delta of (l, r) edges creates wedges only
    * inside the left vertices it touches: the new wedges are
    * (delta ⋈ base-edges-of-touched-l) pairs plus delta-internal pairs
    * on the same l, so the update semi-join-restricts base to the
    * delta's left vertices (cost ∝ Σ_{touched l} deg(l)² — the wedge
    * ball, never the graph), rolls up dw per (r1, r2), and merges
    * w' = w + dw by full-outer on the pair key. Exactness is the
    * wedge-multiset decomposition: wedges(base ∪ delta) = wedges(base)
    * ⊎ wedges(≥1 delta edge), and both edges of a wedge share l, so
    * every new wedge is produced exactly once (base⋈delta pairs
    * ordered r≠r'; delta-internal pairs r < r''). Contract: edges
    * deduplicated, base ∩ delta = ∅ (the triangle form's contract).
    * Readout: [[butterflyReadout]] over the maintained frame ≡ the
    * batch census, by composition. */
  def incrementalButterflyCopairs(prevPairs: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    def norm(df: DataFrame) = df.toDF("l", "r")
      .select(col("l").cast("long").as("l"), col("r").cast("long").as("r"))
    val bE = norm(baseEdges)
    val dE = norm(deltaEdges)
    val hint = frontierHinter(bE)
    // base edges of the delta's left vertices — the wedge ball
    val ball = bE.join(hint(dE.select(col("l")).distinct()), Seq("l"), "left_semi")
    // each (delta, base) wedge once, canonicalized; delta-internal once via <
    val dxb = dE.as("d").join(hint(ball).as("b"),
        col("d.l") === col("b.l") && col("d.r") =!= col("b.r"))
      .select(least(col("d.r"), col("b.r")).as("r1"),
        greatest(col("d.r"), col("b.r")).as("r2"))
    val dxd = dE.as("x").join(hint(dE).as("y"),
        col("x.l") === col("y.l") && col("x.r") < col("y.r"))
      .select(col("x.r").as("r1"), col("y.r").as("r2"))
    val dw = dxb.unionByName(dxd).groupBy(col("r1"), col("r2"))
      .agg(count(lit(1)).as("dw"))
    prevPairs.toDF("r1", "r2", "w")
      .join(dw, Seq("r1", "r2"), "full_outer")
      .select(col("r1"), col("r2"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("w"))
  }

  /** INCREMENTAL triangle counts — the q164/q253/q304 "incremental ≡
    * recompute" discipline applied to [[triangleCounts]]: given the base
    * graph's output and a DISJOINT `deltaEdges` wave (both undirected
    * `(a, b)`, a < b, deduplicated, base ∩ delta = ∅), produce
    * (node, deg, tri, lcc_ppm) IDENTICAL to re-running the batch operator
    * over base ∪ delta, recomputing only the delta's radius-1 region.
    *
    * Exactness argument: triangles are RADIUS-1 objects. A node's row
    * changes only if (a) it is a delta endpoint (degree changes; possibly
    * new triangles through the new edge) or (b) a new triangle passes
    * through it — and every new triangle contains a delta edge (u, v)
    * plus a third vertex w adjacent to BOTH u and v in the union, so its
    * vertices all lie in AFFECTED = endpoints(delta) ∪ {common union-
    * neighbors of delta-edge endpoints}. For any affected node x, every
    * triangle through x lives inside {x} ∪ N(x) ⊆ BALL = AFFECTED ∪
    * N(AFFECTED), and the union-induced subgraph on BALL contains all of
    * N(x) and every edge among N(x) — so the batch recurrence on that
    * subgraph reproduces x's (deg, tri) EXACTLY, and only affected rows
    * are taken from it; everything else passes through from `prevCounts`
    * verbatim. No approximation anywhere; IncrementalTrianglesSpec pins
    * equality against the one-shot batch run (random waves, wedge-close
    * deltas, new-node deltas, dag-cycle maintenance).
    *
    * Scale shape: AFFECTED is built by one wedge-close join (delta ⋈
    * adjacency, semi-join pruned — NO neighbors(u) × neighbors(v)
    * blowup), the ball by one more adjacency hop, and the recompute runs
    * the O(m_sub^1.5) oriented counting on ball-incident edges only —
    * cost ∝ the touched region, not the corpus. The nightly dup-graph
    * audit (q139's shape) maintains in the delta's neighborhood.
    * Inherits [[triangleCounts]]'s node < 2^32 packing contract. */
  def incrementalTriangleCounts(prevCounts: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    def norm(df: DataFrame) = df.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val bE = norm(baseEdges)
    val dE = norm(deltaEdges)
    // eager localCheckpoints, not just pins: every frame below is
    // referenced several times (nbrs 3x, sub 3x inside triangleCounts'
    // orientation), and without a lineage cut each reference re-embeds
    // the caller's whole pair-pipeline plan — the ANALYZER, not the data,
    // became the cost (measured: 256-edge dup graph, 38 s before /
    // 2 s after; the q293/q304 flat-lineage discipline)
    val all = bE.unionByName(dE).localCheckpoint(true)
    // symmetric adjacency (u, w): one frame serves the wedge close and
    // the ball hop, and nothing else touches the full corpus
    val nbrs = all.select(col("a").as("u"), col("b").as("w"))
      .unionByName(all.select(col("b").as("u"), col("a").as("w")))
      .localCheckpoint(true)
    val ends = dE.select(col("a").as("node"))
      .unionByName(dE.select(col("b").as("node"))).distinct()
    // common neighbors of each delta edge's endpoints: (a, b, w ~ a),
    // semi-joined on (b, w) ~ adjacency — the wedge-close plan
    val cn = dE.join(nbrs.select(col("u").as("a"), col("w")), "a")
      .join(nbrs.select(col("u").as("b"), col("w")), Seq("b", "w"), "left_semi")
      .select(col("w").as("node"))
    val affected = ends.unionByName(cn).distinct().localCheckpoint(true)
    val ballA = affected.unionByName(
        nbrs.join(affected.select(col("node").as("u")), "u")
          .select(col("w").as("node")))
      .distinct().localCheckpoint(true)
    // re-select (a, b): the USING-joins front their key, and the batch
    // operator renames POSITIONALLY via toDF
    val sub = all
      .join(ballA.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(ballA.select(col("node").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
      .localCheckpoint(true)
    val recomputed = triangleCounts(sub).join(affected, Seq("node"))
    prevCounts.toDF("node", "deg", "tri", "lcc_ppm")
      .join(affected, Seq("node"), "left_anti")
      .unionByName(recomputed)
  }

  /** HITS hubs-and-authorities in exact integer arithmetic over a
    * DIRECTED edge list `(src, dst)`: the complementary centrality to
    * [[integerPageRank]] (good hubs point at good authorities; good
    * authorities are pointed at by good hubs — the right split for
    * crawl/link graphs where pointing and being-pointed-at mean different
    * things). Classical HITS L2-normalizes each half-step; the integer
    * formulation rescales by the MAX instead — a ← (a·S) div max(a) —
    * which preserves the ranking ORDER exactly (monotone transform),
    * keeps every value in [0, S], and makes the fixed-iteration result
    * bit-identical across engines (floor divisions on non-negative
    * longs). Overflow bound: S·maxInDegree per sum, < 2^63 for any
    * realistic graph at S = 10^6.
    *
    * Per iteration: two shuffle joins + two map-side-combinable sums +
    * two scalar-max broadcasts (1-row crossJoin — dimension-bounded, the
    * house model-state pattern). Returns (node, hub, auth) with 0 for a
    * side the node doesn't participate in. */
  def integerHits(edges: DataFrame, iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    val e = PinnedCache.pin(edges.toDF("src", "dst").distinct())
    // the auth half-step joins e on src, the hub half-step on dst —
    // each once per iteration. Two pinned pre-partitioned orientations
    // let all 2·iters joins reuse one exchange each instead of
    // re-exchanging the static edge frame per half-step (guide §2.4;
    // cost: the edge frame is cached twice — edge-sized, spillable).
    // Size-gated like pinLadderEdges: tiny graphs broadcast anyway.
    val eBig = e.count() >= 32768L
    val eS = if (eBig) PinnedCache.pin(e.repartition(col("src"))) else e
    val eD = if (eBig) PinnedCache.pin(e.repartition(col("dst"))) else e
    var hub = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(scale)).localCheckpoint(true)
    var auth = e.sparkSession.emptyDataFrame
    for (_ <- 1 to iters) {
      val a0 = eS.join(hub.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
      auth = a0.crossJoin(broadcast(a0.agg(max(col("a")).as("mx"))))
        .select(col("node"), expr(s"(a * ${scale}L) div mx").as("a"))
        .localCheckpoint(true)
      val h0 = eD.join(auth.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
      hub = h0.crossJoin(broadcast(h0.agg(max(col("h")).as("mx"))))
        .select(col("node"), expr(s"(h * ${scale}L) div mx").as("h"))
        .localCheckpoint(true)
    }
    hub.select(col("node"), col("h").as("hub"))
      .join(auth.select(col("node"), col("a").as("auth")), Seq("node"), "full_outer")
      .na.fill(0L, Seq("hub", "auth"))
  }

  /** One half-step of the [[integerHits]] rescale trace: the global MAX of
    * the UNSCALED sums and how many nodes attain it. `side` is "a" (auth
    * half-step) or "h" (hub half-step); steps are ordered a1, h1, a2, h2…
    * — 2·iters rows total, statistic-cardinality MODEL STATE (the house
    * collect rule), and exactly the evidence [[incrementalHits]] needs to
    * decide whether a delta's influence stays local: values outside the
    * touched ball change ONLY through these divisors. */
  final case class HitsMax(step: Int, side: String, mx: Long, nAt: Long)

  /** [[integerHits]] plus its per-half-step rescale TRACE — bit-identical
    * ranks (same joins, same floor divisions; the max is collected and
    * re-injected as a literal instead of broadcast-crossJoined), plus the
    * 2·iters [[HitsMax]] rows a later [[incrementalHits]] call consumes.
    * The extra cost is two scalar aggregates per half-step on node-keyed
    * frames. */
  def integerHitsTrace(edges: DataFrame, iters: Int,
      scale: Long = 1000000L): (DataFrame, Seq[HitsMax]) = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    val e = PinnedCache.pin(edges.toDF("src", "dst").distinct())
    // two pinned pre-partitioned orientations — the [[integerHits]] trade
    val eBig = e.count() >= 32768L
    val eS = if (eBig) PinnedCache.pin(e.repartition(col("src"))) else e
    val eD = if (eBig) PinnedCache.pin(e.repartition(col("dst"))) else e
    var hub = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(scale)).localCheckpoint(true)
    var auth = e.sparkSession.emptyDataFrame
    val trace = scala.collection.mutable.ArrayBuffer.empty[HitsMax]
    def maxAndCount(raw: DataFrame, c: String): (Long, Long) = {
      val mx = raw.agg(max(col(c))).collect().head.getLong(0)
      (mx, raw.where(col(c) === mx).count())
    }
    for (i <- 1 to iters) {
      val a0 = eS.join(hub.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
        .localCheckpoint(true)
      val (mxA, nA) = maxAndCount(a0, "a")
      trace += HitsMax(i, "a", mxA, nA)
      auth = a0.select(col("node"), expr(s"(a * ${scale}L) div ${mxA}L").as("a"))
        .localCheckpoint(true)
      val h0 = eD.join(auth.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
        .localCheckpoint(true)
      val (mxH, nH) = maxAndCount(h0, "h")
      trace += HitsMax(i, "h", mxH, nH)
      hub = h0.select(col("node"), expr(s"(h * ${scale}L) div ${mxH}L").as("h"))
        .localCheckpoint(true)
    }
    val ranks = hub.select(col("node"), col("h").as("hub"))
      .join(auth.select(col("node"), col("a").as("auth")), Seq("node"), "full_outer")
      .na.fill(0L, Seq("hub", "auth"))
    (ranks, trace.toSeq)
  }

  /** INCREMENTAL HITS — the q304 discipline applied to the eigen tier's
    * second maintained form: given the base graph's final (node, hub,
    * auth) AND its rescale trace (both from [[integerHitsTrace]]) and a
    * DISJOINT additive `deltaEdges` wave, produce ranks IDENTICAL to
    * re-running the batch operator over base ∪ delta, recomputing only
    * the delta's neighborhood.
    *
    * Exactness argument (fixed `iters` = R, 2R half-steps): influence
    * moves one UNDIRECTED hop per half-step (hub(u) feeds auth(v) along
    * u→v; auth(v) feeds hub(u) back along the same edge), and hub_0 = S
    * uniformly (HITS has no 1/N term — unlike PageRank, NEW nodes are
    * local). So, PROVIDED every half-step's global rescale max is
    * unchanged, the raw sums and scaled values that differ from the base
    * run after k half-steps lie within k−1 undirected hops of a delta
    * endpoint — the final values within the (2R−1)-hop `take` ball.
    * Recomputing the take ball exactly needs edges incident to nodes
    * within 2R−1 FURTHER hops (a node at dependency depth j is exact for
    * half-steps ≤ 2R−j; depth-2R nodes enter through their exact
    * hub_0 = S init alone), over which the SAME recurrence replays with
    * the STORED maxes as divisors — no global aggregate.
    *
    * GLOBALITY GUARD (the max-rescale twin of q304's new-src fallback):
    * every half-step divides by the global max of the raw sums, so ANY
    * max shift changes every node's scaled value and locality dies. The
    * guard decides each half-step's new max from ball-local evidence
    * plus the trace: raw sums outside the take ball equal the base
    * run's, so m_new = max(m_out, maxRawInBall_new) where m_out (the
    * outside max) = m_base iff some base attainer lies OUTSIDE the ball
    * (attainers-in-ball count < n_at from the trace). The incremental
    * path proceeds only when m_new provably equals m_base:
    *   - maxRawInBall_new == m_base → equal (outside can only tie), OR
    *   - maxRawInBall_new < m_base AND attainers-in-ball < n_at →
    *     outside still attains m_base;
    * anything else (a new higher max, or the old max's attainers all
    * inside the touched ball) falls back to the batch recurrence over
    * base ∪ delta — exactness over cleverness. The attainer count per
    * half-step comes from a restricted replay of the BASE run over the
    * same subgraph (exact there by the dependency argument), so the
    * guard needs no stored per-node history — just the 2R (max, n_at)
    * trace rows.
    *
    * Scale shape: one undirected ball growth (frontier joins with the
    * settled/frontier split, cost ∝ touched region), two restricted
    * replays over ball-incident edges, and 2R scalar aggregates. On the
    * sparse near-dup graphs this maintains nightly, the ball is the
    * delta's neighborhood. Requires base ∩ delta = ∅ and delta =
    * ADDITIONS only (edge multiplicity feeds the sums). */
  def incrementalHits(prevRanks: DataFrame, prevTrace: Seq[HitsMax],
      baseEdges: DataFrame, deltaEdges: DataFrame, iters: Int,
      scale: Long = 1000000L): DataFrame =
    incrementalHitsTrace(prevRanks, prevTrace, baseEdges, deltaEdges,
      iters, scale)._1

  /** [[incrementalHits]] plus the MAINTAINED trace for the union graph —
    * what a nightly maintainer carries to the next wave. On the
    * incremental path the guard has proven every max unchanged, so only
    * the attainer counts move: n_at' = n_at − (base attainers inside the
    * ball) + (new attainers inside the ball), both already measured by
    * the restricted replays (outside the ball raw sums are unchanged).
    * On the fallback path the trace is recomputed by the batch run. */
  def incrementalHitsTrace(prevRanks: DataFrame, prevTrace: Seq[HitsMax],
      baseEdges: DataFrame, deltaEdges: DataFrame, iters: Int,
      scale: Long = 1000000L): (DataFrame, Seq[HitsMax]) = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    require(prevTrace.size == 2 * iters, "trace must carry 2*iters half-steps")
    val bE = PinnedCache.pin(baseEdges.toDF("src", "dst").distinct())
    val dE = PinnedCache.pin(deltaEdges.toDF("src", "dst").distinct())
    val all = PinnedCache.pin(bE.unionByName(dE))
    // undirected adjacency for influence/dependency ball growth
    val undirected = PinnedCache.pin(
      all.unionByName(all.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val seeds = dE.select(col("src").as("node"))
      .unionByName(dE.select(col("dst").as("node"))).distinct()
    // one ball, two radii: take = 2R-1 (where finals can change),
    // region = 4R-2 (whose incident edges the restricted replays need)
    val takeRadius = 2 * iters - 1
    val regionRadius = 4 * iters - 2
    var frontier = seeds.withColumn("d", lit(0L)).localCheckpoint(true)
    var ball = frontier
    for (r <- 1 to regionRadius) {
      val cand = undirected
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
      frontier = cand.join(ball, Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("d")).localCheckpoint(true)
      ball = ball.unionByName(frontier)
    }
    val take = PinnedCache.pin(
      ball.where(col("d") <= takeRadius.toLong).select(col("node")))
    val region = ball.select(col("node"))
    // edges with EITHER endpoint in the region: every region node keeps
    // its FULL in/out edge set (column order re-pinned after USING joins)
    def incident(e: DataFrame) = PinnedCache.pin(
      e.join(region.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .select(col("src"), col("dst"))
        .unionByName(
          e.join(region.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
            .select(col("src"), col("dst")))
        .distinct())
    val subNew = incident(all)
    val subBase = subNew.join(dE, Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"))
    // restricted replay with the STORED maxes as divisors; returns final
    // (hub, auth) plus per-half-step ball-local evidence
    def replay(e0: DataFrame): (DataFrame, DataFrame, Seq[(Long, Long)]) = {
      val e = PinnedCache.pin(e0)
      var hub = e.select(col("src").as("node")).distinct()
        .withColumn("h", lit(scale)).localCheckpoint(true)
      var auth = e.sparkSession.emptyDataFrame
      val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def ballStats(raw: DataFrame, c: String, mBase: Long): (Long, Long) = {
        // ONE action per half-step: max and attainer count ride the same
        // ball-restricted aggregate (was: checkpoint + two jobs — 3
        // driver round-trips per half-step on a latency-bound path)
        val row = raw.join(take, Seq("node"), "left_semi")
          .agg(coalesce(max(col(c)), lit(0L)).as("mx"),
            coalesce(sum(when(col(c) === mBase, 1L)), lit(0L)).as("n_at"))
          .collect().head
        (row.getLong(0), row.getLong(1))
      }
      for (i <- 1 to iters) {
        val tA = prevTrace(2 * (i - 1))
        val a0 = e.join(hub.select(col("node").as("src"), col("h")), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
          .localCheckpoint(true)
        stats += ballStats(a0, "a", tA.mx)
        auth = a0.select(col("node"), expr(s"(a * ${scale}L) div ${tA.mx}L").as("a"))
          .localCheckpoint(true)
        val tH = prevTrace(2 * (i - 1) + 1)
        val h0 = e.join(auth.select(col("node").as("dst"), col("a")), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
          .localCheckpoint(true)
        stats += ballStats(h0, "h", tH.mx)
        hub = h0.select(col("node"), expr(s"(h * ${scale}L) div ${tH.mx}L").as("h"))
          .localCheckpoint(true)
      }
      (hub, auth, stats.toSeq)
    }
    // the two restricted replays are INDEPENDENT 2·iters-half-step
    // ladders — overlap them on driver threads (§2.6 / [[DriverPar]]);
    // same frames, same stats, deterministic order
    val Seq((_, _, baseStats), (newHub, newAuth, newStats)) =
      DriverPar.map(bE.sparkSession, Seq(subBase, subNew))(replay)
    // the guard: every half-step's new global max must provably equal the
    // stored one; otherwise every outside value's divisor shifts → batch
    val localOk = prevTrace.indices.forall { k =>
      val t = prevTrace(k)
      val newMaxInBall = newStats(k)._1
      val baseAttainersInBall = baseStats(k)._2
      newMaxInBall == t.mx || (newMaxInBall < t.mx && baseAttainersInBall < t.nAt)
    }
    if (!localOk) integerHitsTrace(all, iters, scale)
    else {
      val recomputed = newHub.select(col("node"), col("h").as("hub"))
        .join(newAuth.select(col("node"), col("a").as("auth")),
          Seq("node"), "full_outer")
        .na.fill(0L, Seq("hub", "auth"))
        .join(take, Seq("node"), "left_semi")
        .select(col("node"), col("hub"), col("auth"))
      val ranks = prevRanks.toDF("node", "hub", "auth")
        .join(take, Seq("node"), "left_anti")
        .select(col("node"), col("hub"), col("auth"))
        .unionByName(recomputed)
      val newTrace = prevTrace.indices.map { k =>
        val t = prevTrace(k)
        t.copy(nAt = t.nAt - baseStats(k)._2 + newStats(k)._2)
      }
      (ranks, newTrace)
    }
  }

  /** Multi-source BFS over a directed edge list `(src, dst)`: exact
    * min-hop distance from a seed set, after `rounds` expansion rounds
    * (nodes further than `rounds` hops are absent — the fixed-iteration
    * contract of [[integerPageRank]]; a crawl-frontier "distance from the
    * trusted core" is naturally hop-bounded anyway). Node ids are opaque
    * (string hosts work — the [[integerPageRank]]/q172 convention).
    *
    * Delta-frontier expansion with the settled/frontier split (the
    * [[labeledBfs]] plan, single node key): round r only expands nodes
    * first reached at distance r−1, dedupes the expansion, and anti-joins
    * it against the settled set — only NEW nodes are aggregated and
    * checkpointed per round (exact by BFS monotonicity: any later sight
    * of a settled node has d ≥ its settled d). Total shuffled work
    * O(Σ frontier out-degree) = O(m) across all rounds, and the settled
    * set is scanned, never re-aggregated. Lineage flattened per round. */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50, "rounds in [1,50]")
    // frontier/settled are localCheckpoint-ed, which ERASES stats — on
    // big graphs the planning-time broadcast hint keeps every
    // e⋈frontier a scan of e instead of a full-edge exchange per round;
    // on small graphs the edge frame is pinned pre-partitioned by the
    // join key instead, so the per-round join re-exchanges only the
    // frontier ([[pinLadderEdges]]; measured both ways)
    val (e, mh) = pinLadderEdges(edges.toDF("src", "dst"), "src")
    var frontier = mh(seeds.toDF("node").distinct()
      .withColumn("d", lit(0L)).localCheckpoint(true))
    var settled = frontier
    for (r <- 1 to rounds) {
      val candidates = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node"))
        .distinct()
      frontier = mh(candidates
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("d"))
        .localCheckpoint(true))
      settled = settled.unionByName(frontier)
    }
    settled
  }

  /** Sampled HARMONIC centrality — the distance-based centrality tier
    * (closeness family), complementing the eigen tier ([[integerPageRank]],
    * [[integerHits]]) and the cohesion tier ([[triangleCounts]]):
    * harmonic(v) = Σ_{s ∈ seeds, 1 ≤ d(s,v) ≤ rounds} (10^6 div d(s,v)),
    * in exact integer ppm (floor division on non-negative longs — no
    * float, engine-portable). Harmonic (not classic closeness) because it
    * handles disconnected graphs gracefully: unreachable seeds contribute
    * 0 instead of poisoning an average. Hop-bounded and seed-sampled —
    * both standard: contributions decay as 1/d so the tail beyond a few
    * hops is noise, and seed sampling is the textbook estimator (pass all
    * nodes as seeds for the exact hop-bounded value on small graphs, a
    * deterministic sample on 100 TB link graphs; the estimate scales by
    * N/|seeds|). Node ids are opaque (string hosts work).
    *
    * Plan: bitmask multi-source BFS ([[multiSourceBfs]] — node-keyed
    * mask words with map-side-combinable bit_or, so ALL seeds advance in
    * the SAME per-round join and the per-round shuffle is
    * |edges|·⌈seeds/64⌉ words, not |seeds|·|ball| candidate pairs; the
    * round-11 upgrade over the pair-keyed [[labeledBfs]], which remains
    * the incremental substrate). Returns (node, harmonic_ppm, n_reached)
    * for nodes reached by ≥1 seed at d ≥ 1. */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame =
    multiSourceBfs(edges, seeds, rounds)
      .where(col("d") >= 1L)
      .groupBy(col("node"))
      .agg(sum(expr("cast(1000000 as bigint) div d")).as("harmonic_ppm"),
        count(lit(1)).as("n_reached"))

  /** Labeled multi-source BFS: exact min-hop (seed, node, d) for every
    * seed-reached node within `rounds` hops — ALL seeds advance in the
    * SAME per-round edges⋈frontier join (state |seeds|·|ball|, the
    * [[bfsDistances]] delta-frontier plan with a composite key). The
    * pair-keyed formulation; [[multiSourceBfs]] produces the same rows
    * from a node-keyed bitmask plan and is what the batch readouts
    * ([[harmonicCentrality]], [[distanceHistogram]]) use — this one
    * remains the reference twin ([[multiSourceBfs]]'s spec pins
    * equality) and the [[incrementalLabeledBfs]] contract anchor.
    *
    * Settled/frontier split: each round shuffles only the NEW frontier
    * expansion — candidates are deduped within the round, then anti-
    * joined against the accumulated settled set (a union of the per-
    * round checkpointed frontiers; the anti-join SCANS settled but the
    * settled rows are never re-aggregated or re-checkpointed). Exact by
    * BFS monotonicity: a (seed, node) pair is discovered first at its
    * minimum distance, and every later candidate for a settled pair has
    * d ≥ the settled d — so dropping it via the anti-join is verbatim
    * pass-through, and min(d) is needed only WITHIN a round (where all
    * candidates share d = r, so distinct suffices). The old plan re-ran
    * groupBy(seed, node).min(d) over the FULL settled set every round —
    * O(rounds · settled) shuffle for the same output. */
  private[ext] def labeledBfs(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    // size-gated edge pin (the [[pinLadderEdges]] trade): on big graphs
    // e⋈frontier stays a scan of e via frontier hints; on small graphs
    // e is pinned pre-partitioned by src so rounds reuse one exchange
    val (e, mh) = pinLadderEdges(edges.toDF("src", "dst"), "src")
    var frontier = mh(seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("d"))
      .localCheckpoint(true))
    var settled = frontier
    for (r <- 1 to rounds) {
      val candidates = e
        .join(frontier.select(col("seed"), col("node").as("src")), "src")
        .select(col("seed"), col("dst").as("node"))
        .distinct()
      frontier = mh(candidates
        .join(settled, Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(r.toLong).as("d"))
        .localCheckpoint(true))
      settled = settled.unionByName(frontier)
    }
    settled
  }

  /** Bitmask MULTI-SOURCE BFS — [[labeledBfs]]'s output from a node-keyed
    * plan (the textbook MS-BFS layout): seeds get dense bit indices
    * (sorted order — deterministic), per-node reachability is a sparse
    * set of (node, word, mask) longs, and one round is
    *
    *   edges ⋈ masks → groupBy(dst, word).bit_or(mask) → full-outer
    *   merge with the previous masks; NEW bits (prop & ~old) decode to
    *   (seed, node, d = r) rows.
    *
    * Why it beats the pair-keyed plan for ALL-NODES seeding: the
    * per-round shuffle is |edges|·⌈seeds/64⌉ mask words with map-side
    * combinable bit_or — the q307/q309 host graph moves ~0.5M words per
    * round instead of ~10M (seed, node) candidate pairs, and the state
    * re-materialized per round is node×words, not |seeds|·|ball| pairs.
    * Emitted (seed, node, d) rows are appended per round and never
    * reshuffled. Exact: a bit first turns on at exactly the pair's
    * min-hop distance (bit OR is the frontier union), pinned ≡
    * [[labeledBfs]] by MultiSourceBfsSpec. The seed-index table is
    * model-state sized (seeds are all nodes on small graphs, a
    * deterministic sample at 100 TB — the operator contract). Bit 63's
    * sign does not matter: only &, |, ~, != 0 touch the masks. */
  def multiSourceBfs(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    import org.apache.spark.sql.expressions.Window
    // per-round propagation joins e on src every round — same gated pin
    // as the pair-keyed ladders ([[pinLadderEdges]]); mask frames are
    // node×words sized, so the big-graph plan keeps its un-hinted shape
    // (the hinter is discarded — no behavior change above the gate)
    val (e, _) = pinLadderEdges(edges.toDF("src", "dst"), "src")
    val idx = PinnedCache.pin(seeds.toDF("seed").distinct()
      .select(col("seed"),
        (row_number().over(Window.orderBy(col("seed"))) - 1)
          .cast("long").as("i")))
    var reached = idx.select(col("seed").as("node"),
        expr("i div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(i % 64 as int))").as("m"))
      .localCheckpoint(true)
    val pairChunks = scala.collection.mutable.ArrayBuffer(
      idx.select(col("seed"), col("seed").as("node"), lit(0L).as("d")))
    for (r <- 1 to rounds) {
      val prop = e
        .join(reached.select(col("node").as("src"), col("w"), col("m")), "src")
        .groupBy(col("dst").as("node"), col("w"))
        .agg(expr("bit_or(m)").as("pm"))
      val merged = reached.select(col("node"), col("w"), col("m").as("om"))
        .join(prop, Seq("node", "w"), "full_outer")
        .select(col("node"), col("w"),
          (coalesce(col("om"), lit(0L)).bitwiseOR(coalesce(col("pm"), lit(0L))))
            .as("m"),
          (coalesce(col("pm"), lit(0L))
            .bitwiseAND(expr("~coalesce(om, cast(0 as bigint))"))).as("nb"))
        .localCheckpoint(true)
      reached = merged.select(col("node"), col("w"), col("m"))
      pairChunks += merged.where(col("nb") =!= 0L)
        .select(col("node"), explode(expr(
          """filter(transform(sequence(0, 63), b ->
            |  case when (nb & shiftleft(cast(1 as bigint), b)) != 0
            |    then b end), x -> x is not null)""".stripMargin)).as("b"),
          col("w"))
        .select((col("w") * 64L + col("b")).as("i"), col("node"))
        .join(idx, "i")
        .select(col("seed"), col("node"), lit(r.toLong).as("d"))
    }
    pairChunks.reduce(_ unionByName _)
  }

  /** INCREMENTAL labeled BFS — the q304/q306/q308/q310 maintenance
    * discipline applied to the DISTANCE tier: given the base graph's
    * settled (seed, node, d) set (= [[labeledBfs]](baseEdges, seeds,
    * rounds)) and a DISJOINT additive `deltaEdges` wave, produce the set
    * IDENTICAL to re-running [[labeledBfs]] over base ∪ delta with the
    * SAME seed set — relaxing only pairs whose distance improves.
    *
    * Exactness argument (edge ADDITIONS, fixed hop bound R): distances
    * only DECREASE, and every improved pair's new shortest ≤R-hop path
    * crosses a delta edge. Injection relaxes each delta edge once from
    * the base-settled state ((s, u, d) ⋈ (u→w) → candidate (s, w, d+1));
    * the loop then relaxes the union edge set from the improved frontier
    * only — Bellman-Ford restricted to improvements, which converges in
    * ≤ R iterations because an improving path has ≤ R hops and each
    * iteration extends the settled prefix of such a path by one hop
    * (injection uses base distances for the prefix BEFORE the first
    * delta edge, which later iterations re-improve if that prefix itself
    * shortens — the chained-delta case). Pairs with no improving path
    * keep their base rows VERBATIM (anti-join pass-through). No
    * approximation; IncrementalLabeledBfsSpec pins equality per wave.
    *
    * Scale shape (round-12: the [[multiSourceBfs]] bitmask lesson
    * applied to the MAINTAINED side): the settled set is SCANNED, never
    * rewritten — one node-keyed forward ball from the delta dsts
    * ([[bfsDistances]], cost ∝ the touched region) prefilters it to the
    * only pairs improvements can touch (every candidate's node lies
    * within `rounds` forward hops of a delta dst). That slice and the
    * improvement state are then carried as ≤R MASK LAYERS — for each d,
    * (node, word, mask) of seeds at distance d — so injection,
    * relaxation (edges ⋈ frontier → bit_or, map-side combinable), and
    * the two improvement tests (AND-NOT against the cumulative ≤d
    * layers of the base slice and of the accumulated improvements) all
    * move ⌈seeds/64⌉-packed words, not (seed, node, d) pair rows — a
    * ~64× exchange reduction in the dense all-seeds regime. Exactness
    * is the same monotone-improvement argument in mask form: a bit
    * passes the layer-d AND-NOT exactly when d < its best known
    * distance (cumulative layers encode "distance ≤ d"; exact layers
    * are disjoint per (node, seed), so bit_or = union). A re-improved
    * pair may transiently sit in two layers; the single output-sized
    * decode at the END takes min(d) per pair (the old groupBy-min,
    * deferred). The one full-settled anti-join happens once at the END
    * (output-sized anyway). The hop bound caps candidate d at R, so
    * state never exceeds the node×words×R bound. Requires base ∩ delta
    * = ∅ and the seed set unchanged. */
  def incrementalLabeledBfs(prevDist: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    import org.apache.spark.sql.expressions.Window
    val bE = baseEdges.toDF("src", "dst")
    val dE0 = deltaEdges.toDF("src", "dst").distinct().localCheckpoint(true)
    // NO full-graph distinct (the r13 incrementalKatz finding): every
    // consumer of the edge set here is duplicate-IMMUNE — bit_or layers
    // and BFS reachability are idempotent — so base ∪ delta is only
    // ever SCANNED, never exchanged
    // relaxation joins `all` on src every iteration — gated pin
    // ([[pinLadderEdges]]): small graphs pre-partition by src, big
    // graphs keep the frontier hints
    val (all, mh) = pinLadderEdges(bE.unionByName(dE0), "src")
    val dE = mh(dE0)
    val settled = PinnedCache.pin(prevDist.toDF("seed", "node", "d"))
    // dense seed-bit index over the (unchanged) seed universe — the
    // multiSourceBfs convention: sorted order, deterministic
    val idx = PinnedCache.pin(settled.select(col("seed")).distinct()
      .select(col("seed"),
        (row_number().over(Window.orderBy(col("seed"))) - 1)
          .cast("long").as("i")))
    // (seed, node, d) pairs → exact mask layers (node, w, d, m); exact
    // layers for one (node, seed) are disjoint across d, so bit_or = ∪
    def toLayers(pairs: DataFrame): DataFrame = pairs
      .join(idx, "seed")
      .select(col("node"), expr("i div 64").as("w"), col("d"),
        expr("shiftleft(cast(1 as bigint), cast(i % 64 as int))").as("bit"))
      .groupBy(col("node"), col("w"), col("d"))
      .agg(expr("bit_or(bit)").as("m"))
    // cumulative form: for every d' in d..R, bits with distance ≤ d'
    def cumulate(layers: DataFrame): DataFrame = layers
      .select(col("node"), col("w"),
        explode(sequence(col("d"), lit(rounds.toLong))).as("d"), col("m"))
      .groupBy(col("node"), col("w"), col("d"))
      .agg(expr("bit_or(m)").as("cum"))
    // drop candidate bits whose best known distance in `cum` is ≤ d —
    // i.e. keep exactly the bits for which layer-d is an IMPROVEMENT
    def minusCum(cands: DataFrame, cum: DataFrame): DataFrame = cands
      .join(cum, Seq("node", "w", "d"), "left_outer")
      .select(col("node"), col("w"), col("d"),
        col("m").bitwiseAND(expr("~coalesce(cum, cast(0 as bigint))")).as("m"))
      .where(col("m") =!= 0L)
    // self-prune: a bit present at two layers of the same frame keeps
    // only its smallest d (the deferred groupBy-min, applied early so
    // stale copies don't propagate)
    def selfPrune(layers: DataFrame): DataFrame = {
      val less = layers
        .where(col("d") < rounds.toLong)
        .select(col("node"), col("w"),
          explode(sequence(col("d") + 1L, lit(rounds.toLong))).as("d"), col("m"))
        .groupBy(col("node"), col("w"), col("d"))
        .agg(expr("bit_or(m)").as("cum"))
      minusCum(layers, less)
    }
    // every candidate node sits within `rounds` FORWARD hops of a delta
    // dst, so this slice of settled is the only state improvements can
    // compare against — the full set is never reshuffled per iteration
    val ballNodes = mh(bfsDistances(all, dE.select(col("dst")), rounds)
      .select(col("node")).localCheckpoint(true))
    val baseCum = PinnedCache.pin(cumulate(toLayers(
      settled.join(ballNodes, Seq("node"), "left_semi"))))
    // injection: relax every delta edge once from the base-settled state
    val injected = toLayers(
      settled.join(dE.select(col("src").as("node"), col("dst")), "node")
        .select(col("seed"), col("dst").as("node"), (col("d") + 1L).as("d"))
        .where(col("d") <= rounds.toLong))
    var frontier = mh(
      selfPrune(minusCum(injected, baseCum)).localCheckpoint(true))
    // improvement state carried TWO ways, each maintained incrementally
    // (r15): `impChunks` accumulates the raw per-round layers for the
    // single decode at the END (min(d) there resolves re-improved bits),
    // and `cumImp` is the CUMULATIVE ≤d mask the improvement test needs —
    // merged per round from the new frontier's cumulate alone (cumulate
    // distributes over bit_or union), instead of re-exploding and
    // re-aggregating the ENTIRE improvement set every round (was:
    // cumulate(imp) + a full imp groupBy per round — O(R·|imp|) exchange
    // volume for state the previous round already aggregated).
    val impChunks = scala.collection.mutable.ArrayBuffer(frontier)
    var cumImp = cumulate(frontier).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val prop = all
        .join(frontier.select(col("node").as("src"), col("w"), col("d"),
          col("m")), "src")
        .select(col("dst").as("node"), col("w"), (col("d") + 1L).as("d"), col("m"))
        .where(col("d") <= rounds.toLong)
        .groupBy(col("node"), col("w"), col("d"))
        .agg(expr("bit_or(m)").as("m"))
      // an improvement must beat BOTH the base state and any earlier
      // improvement of the same pair (a pair can improve twice when a
      // shorter chain lands later — the chained-delta case)
      frontier = mh(
        selfPrune(minusCum(minusCum(prop, baseCum), cumImp))
          .localCheckpoint(true))
      impChunks += frontier
      cumImp = cumImp.withColumnRenamed("cum", "oc")
        .join(cumulate(frontier), Seq("node", "w", "d"), "full_outer")
        .select(col("node"), col("w"), col("d"),
          (coalesce(col("oc"), lit(0L))
            .bitwiseOR(coalesce(col("cum"), lit(0L)))).as("cum"))
        .localCheckpoint(true)
    }
    val imp = impChunks.reduce(_ unionByName _)
    // decode bits → (seed, node) with min d per pair — ONE output-sized
    // pass (a re-improved bit can sit in two layers; min resolves it)
    val improvedPairs = imp
      .select(col("node"), col("w"), col("d"),
        explode(expr(
          """filter(transform(sequence(0, 63), b ->
            |  case when (m & shiftleft(cast(1 as bigint), b)) != 0
            |    then b end), x -> x is not null)""".stripMargin)).as("b"))
      .select((col("w") * 64L + col("b")).as("i"), col("node"), col("d"))
      .join(idx, "i")
      .groupBy(col("seed"), col("node")).agg(min(col("d")).as("d"))
      .localCheckpoint(true)
    settled
      .join(mh(improvedPairs).select(col("seed"), col("node")),
        Seq("seed", "node"), "left_anti")
      .select(col("seed"), col("node"), col("d"))
      .unionByName(improvedPairs)
  }

  /** Seed-sampled, hop-bounded BETWEENNESS centrality in exact integer
    * arithmetic — the PATH-VOLUME tier completing the centrality stack
    * (eigen: [[integerPageRank]]/[[integerHits]]; distance:
    * [[harmonicCentrality]]; cohesion: [[triangleCounts]]): how much
    * shortest-path traffic from the seed sample flows THROUGH each node.
    * The Brandes decomposition, hop-bounded at `rounds` (pairs further
    * apart contribute nothing — the [[harmonicCentrality]] truncation
    * contract) and seeded by a sample (the textbook estimator; all nodes
    * = exact on small graphs, a deterministic sample on 100 TB link
    * graphs).
    *
    * Forward phase: labeled BFS with PATH COUNTS — σ(s, w) at level r =
    * Σ over predecessors v at level r−1 of σ(s, v), with the
    * settled/frontier split ([[labeledBfs]]) so only new pairs shuffle;
    * shortest-path counts are exact longs (no float). Backward phase:
    * dependency accumulation per level, deepest first —
    *   δ'(s, v) = Σ_{v→w, d(w) = d(v)+1} (σ(s,v) · (10⁶ + δ'(s,w))) div σ(s,w)
    * in ppm fixed point with FLOOR division per (v, w) term; terms are
    * summed over a set (order-free), so the value is engine-portable,
    * and the oracle replays the identical ladder in SQL. Returns
    * (node, bc_ppm, n_seeds_through) over nodes at levels 1..rounds−1
    * (level-`rounds` nodes have no in-bound successors: δ' = 0).
    * bc_ppm = Σ_s δ'(s, node) — classic Brandes betweenness × 10⁶,
    * restricted to ≤rounds-hop pairs from the seed set.
    *
    * Overflow bound: σ ≤ maxDeg^rounds and δ' ≤ 10⁶·(pairs downstream);
    * each term σ·(10⁶+δ') must stay under 2⁶³ — holds for the
    * hop-4-bounded host/dup graphs by orders of magnitude (documented,
    * as with [[integerHits]] sums). */
  def betweennessCentrality(edges: DataFrame, seeds: DataFrame,
      rounds: Int, scale: Long = 1000000L): DataFrame =
    rollupBetweenness(betweennessTrace(edges, seeds, rounds, scale))

  /** The final per-node rollup shared by [[betweennessCentrality]] and
    * [[incrementalBetweenness]]: bc_ppm = Σ_s δ'(s, node), seeds-through
    * = count of seeds with positive dependency. */
  private def rollupBetweenness(trace: DataFrame): DataFrame =
    trace.groupBy(col("node"))
      .agg(sum(col("dd")).as("bc_ppm"),
        count(when(col("dd") > 0L, 1L)).as("n_seeds_through"))

  /** [[betweennessCentrality]]'s pre-rollup PER-PAIR dependency frame
    * (seed, node, dd) — the stored state of the maintained form
    * ([[incrementalBetweenness]]): betweenness is a plain per-seed sum
    * (no global coupling), so maintenance can pass an untouched seed's
    * rows through VERBATIM and the rollup re-aggregates. */
  def betweennessTrace(edges: DataFrame, seeds: DataFrame,
      rounds: Int, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 2 && rounds <= 10, "rounds in [2,10]")
    // distinct: σ counts PATHS, so a duplicated edge row would double-count.
    // Both the forward σ joins and the backward contrib join key e by src
    // (renamed node), so the small-graph pin pre-partitions by src once
    // ([[pinLadderEdges]]; hinter discarded — level frames are pair-sized)
    val (e, _) = pinLadderEdges(edges.toDF("src", "dst").distinct(), "src")
    // forward: per-level (seed, node, sigma), settled/frontier split
    var frontier = seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var settledKeys = frontier.select(col("seed"), col("node"))
    for (_ <- 1 to rounds) {
      val cand = e
        .join(frontier.select(col("seed"), col("node").as("src"), col("sigma")), "src")
        .groupBy(col("seed"), col("dst").as("node")).agg(sum(col("sigma")).as("sigma"))
      frontier = cand
        .join(settledKeys, Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), col("sigma"))
        .localCheckpoint(true)
      levels += frontier
      settledKeys = settledKeys.unionByName(frontier.select(col("seed"), col("node")))
    }
    // backward: δ' per level, deepest level first (it has no successors)
    var dep = levels(rounds).select(col("seed"), col("node"), lit(0L).as("dd"))
    val perLevel = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- (rounds - 1) to 1 by -1) {
      val cur = levels(r)
      val succ = levels(r + 1)
        .join(dep, Seq("seed", "node"))
        .select(col("seed"), col("node").as("dst"),
          col("sigma").as("sigma_w"), col("dd").as("dd_w"))
      val contrib = cur
        .join(e.select(col("src").as("node"), col("dst")), "node")
        .join(succ, Seq("seed", "dst"))
        .select(col("seed"), col("node"),
          expr(s"(sigma * (${scale}L + dd_w)) div sigma_w").as("term"))
        .groupBy(col("seed"), col("node")).agg(sum(col("term")).as("dd"))
      dep = cur.select(col("seed"), col("node"))
        .join(contrib, Seq("seed", "node"), "left_outer")
        .select(col("seed"), col("node"), coalesce(col("dd"), lit(0L)).as("dd"))
        .localCheckpoint(true)
      perLevel += dep
    }
    (perLevel :+ levels(rounds)
        .select(col("seed"), col("node"), lit(0L).as("dd")))
      .reduce(_ unionByName _)
  }

  /** INCREMENTAL [[betweennessCentrality]] — the TENTH maintained form,
    * completing the centrality tier (CC q164, LPA q253, PR q304,
    * triangles q306, k-core q308, HITS q310, distances q311, modularity
    * q318, Katz q323): given the stored per-pair dependency trace
    * (= [[betweennessTrace]](baseEdges, seeds, rounds)) and a DISJOINT
    * additive `deltaEdges` wave, produce the rollup IDENTICAL to
    * re-running the batch operator over base ∪ delta with the same
    * seeds.
    *
    * Exactness argument: the hop-≤R Brandes value for seed s depends
    * ONLY on s's forward BFS DAG (levels + σ) — betweenness is a plain
    * per-seed sum with NO global coupling (no 1/N, no max-rescale: the
    * q304/q310 globality audit comes up empty). A delta edge (u, v) is
    * visible to seed s's DAG iff s reaches u within R−1 hops in the
    * UNION graph (only then can the edge carry a ≤R-hop path — whether
    * it shortens a distance, adds a parallel shortest path that raises
    * σ, or enters the dependency ladder). So: affected seeds = the
    * REVERSE (R−1)-ball of the delta srcs over the union graph ∩ the
    * seed set; their traces are recomputed by the batch operator
    * restricted to those seeds; every other seed's rows pass through
    * VERBATIM (seed-keyed anti-join — scanned once, never recomputed).
    *
    * Scale shape: the reverse ball is one [[bfsDistances]] over
    * flipped edges (cost ∝ touched region); recompute cost ∝ affected
    * seeds × their forward DAGs — the within-seed work IS the batch
    * plan (settled/frontier split, level-keyed dependency joins); the
    * pass-through is one trace-sized anti-join at the end. Requires
    * base ∩ delta = ∅ and the seed set unchanged (passed explicitly:
    * a seed ISOLATED in the base graph has no trace rows at all, so
    * the set cannot be recovered from the trace once a delta connects
    * it). */
  def incrementalBetweenness(prevTrace: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, seeds: DataFrame, rounds: Int,
      scale: Long = 1000000L): DataFrame =
    rollupBetweenness(incrementalBetweennessTrace(
      prevTrace, baseEdges, deltaEdges, seeds, rounds, scale))

  /** [[incrementalBetweenness]]'s MAINTAINED trace — what a maintenance
    * pipeline stores for the next wave (the [[incrementalHitsTrace]]
    * convention: trace in, trace out, chainable). */
  def incrementalBetweennessTrace(prevTrace: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, seeds: DataFrame, rounds: Int,
      scale: Long = 1000000L): DataFrame = {
    require(rounds >= 2 && rounds <= 10, "rounds in [2,10]")
    val bE = baseEdges.toDF("src", "dst")
    val dE = PinnedCache.pin(deltaEdges.toDF("src", "dst").distinct())
    val all = PinnedCache.pin(bE.unionByName(dE).distinct())
    val trace = PinnedCache.pin(prevTrace.toDF("seed", "node", "dd"))
    // a delta edge (u, v) is visible to seed s iff d_union(s, u) ≤ R−1:
    // reverse-BFS from the delta srcs over FLIPPED union edges
    val reverseBall = bfsDistances(
      all.select(col("dst").as("src"), col("src").as("dst")),
      dE.select(col("src").as("node")), rounds - 1)
      .select(col("node"))
    val affectedSeeds = PinnedCache.pin(
      seeds.toDF("seed").distinct()
        .join(reverseBall.select(col("node").as("seed")), Seq("seed"), "left_semi"))
    val recomputed = betweennessTrace(all, affectedSeeds, rounds, scale)
    trace.join(affectedSeeds, Seq("seed"), "left_anti")
      .select(col("seed"), col("node"), col("dd"))
      .unionByName(recomputed)
  }

  /** EDGE betweenness centrality — [[betweennessCentrality]]'s per-LINK
    * sibling and the Girvan–Newman splitting signal: how much
    * shortest-path traffic from the seed sample flows OVER each edge
    * (the top edge is the bridge whose removal best separates
    * communities — the chokepoint-LINK readout a curator reads next to
    * the chokepoint-node one). Same exact-integer Brandes ladder, hop-
    * bounded and seed-sampled: per level the per-edge term
    *   ebc(s, v→w) = (σ(s,v) · (10⁶ + δ'(s,w))) div σ(s,w)
    * is captured BEFORE its per-node rollup (one frame serves both the
    * edge accumulation and the node dependency update), including the
    * seed's own level-0 out-edges (the node form excludes sources by
    * convention; edges incident to a source carry real traffic).
    * Cross-consistency: summing a node's outgoing edge values at
    * levels ≥ 1 reproduces its node δ' exactly (EdgeBetweennessSpec
    * pins it). Output: (src, dst, ebc_ppm, n_seeds_through) over edges
    * on ≥ 1 counted shortest path. */
  def edgeBetweenness(edges: DataFrame, seeds: DataFrame,
      rounds: Int, scale: Long = 1000000L): DataFrame =
    rollupEdgeBetweenness(edgeBetweennessTrace(edges, seeds, rounds, scale))

  /** The per-edge rollup shared by [[edgeBetweenness]] and
    * [[incrementalEdgeBetweenness]]. */
  private def rollupEdgeBetweenness(trace: DataFrame): DataFrame =
    trace.groupBy(col("node").as("src"), col("dst"))
      .agg(sum(col("term")).as("ebc_ppm"),
        count(when(col("term") > 0L, 1L)).as("n_seeds_through"))

  /** [[edgeBetweenness]]'s pre-rollup PER-(seed, edge) term frame
    * (seed, node, dst, term) — the stored state of the maintained form
    * ([[incrementalEdgeBetweenness]]): like the node form, per-LINK
    * betweenness is a plain per-seed sum over each seed's forward DAG,
    * so maintenance passes untouched seeds' rows through verbatim. */
  def edgeBetweennessTrace(edges: DataFrame, seeds: DataFrame,
      rounds: Int, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 2 && rounds <= 10, "rounds in [2,10]")
    val e = PinnedCache.pin(edges.toDF("src", "dst").distinct())
    var frontier = seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var settledKeys = frontier.select(col("seed"), col("node"))
    for (_ <- 1 to rounds) {
      val cand = e
        .join(frontier.select(col("seed"), col("node").as("src"), col("sigma")), "src")
        .groupBy(col("seed"), col("dst").as("node")).agg(sum(col("sigma")).as("sigma"))
      frontier = cand
        .join(settledKeys, Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), col("sigma"))
        .localCheckpoint(true)
      levels += frontier
      settledKeys = settledKeys.unionByName(frontier.select(col("seed"), col("node")))
    }
    var dep = levels(rounds).select(col("seed"), col("node"), lit(0L).as("dd"))
    val edgeChunks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def levelTerms(r: Int): DataFrame = {
      val succ = levels(r + 1)
        .join(dep, Seq("seed", "node"))
        .select(col("seed"), col("node").as("dst"),
          col("sigma").as("sigma_w"), col("dd").as("dd_w"))
      levels(r)
        .join(e.select(col("src").as("node"), col("dst")), "node")
        .join(succ, Seq("seed", "dst"))
        .select(col("seed"), col("node"), col("dst"),
          expr(s"(sigma * (${scale}L + dd_w)) div sigma_w").as("term"))
        .localCheckpoint(true)
    }
    for (r <- (rounds - 1) to 1 by -1) {
      val terms = levelTerms(r)
      edgeChunks += terms
      dep = levels(r).select(col("seed"), col("node"))
        .join(terms.groupBy(col("seed"), col("node")).agg(sum(col("term")).as("dd")),
          Seq("seed", "node"), "left_outer")
        .select(col("seed"), col("node"), coalesce(col("dd"), lit(0L)).as("dd"))
        .localCheckpoint(true)
    }
    edgeChunks += levelTerms(0)
    edgeChunks.reduce(_ unionByName _)
  }

  /** INCREMENTAL [[edgeBetweenness]] — the THIRTEENTH maintained form,
    * closing the betweenness pair (node q324, edge this): the q324
    * argument transfers VERBATIM — per-link values are a plain
    * per-seed sum over each seed's forward BFS DAG, and a delta edge
    * (u, v) is visible to seed s's DAG iff s reaches u within R−1
    * hops on the union graph — so recompute the reverse-(R−1)-ball
    * seeds, pass every other seed's stored (seed, node, dst, term)
    * rows through verbatim, and re-roll. Same explicit-seed-set and
    * disjointness contract as [[incrementalBetweennessTrace]]. */
  def incrementalEdgeBetweenness(prevTrace: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, seeds: DataFrame, rounds: Int,
      scale: Long = 1000000L): DataFrame =
    rollupEdgeBetweenness(incrementalEdgeBetweennessTrace(
      prevTrace, baseEdges, deltaEdges, seeds, rounds, scale))

  /** [[incrementalEdgeBetweenness]]'s MAINTAINED trace (chainable). */
  def incrementalEdgeBetweennessTrace(prevTrace: DataFrame,
      baseEdges: DataFrame, deltaEdges: DataFrame, seeds: DataFrame,
      rounds: Int, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 2 && rounds <= 10, "rounds in [2,10]")
    val bE = baseEdges.toDF("src", "dst")
    val dE = PinnedCache.pin(deltaEdges.toDF("src", "dst").distinct())
    val all = PinnedCache.pin(bE.unionByName(dE).distinct())
    val trace = PinnedCache.pin(prevTrace.toDF("seed", "node", "dst", "term"))
    val reverseBall = bfsDistances(
      all.select(col("dst").as("src"), col("src").as("dst")),
      dE.select(col("src").as("node")), rounds - 1)
      .select(col("node"))
    val affectedSeeds = PinnedCache.pin(
      seeds.toDF("seed").distinct()
        .join(reverseBall.select(col("node").as("seed")), Seq("seed"), "left_semi"))
    val recomputed = edgeBetweennessTrace(all, affectedSeeds, rounds, scale)
    trace.join(affectedSeeds, Seq("seed"), "left_anti")
      .select(col("seed"), col("node"), col("dst"), col("term"))
      .unionByName(recomputed)
  }

  /** Pairwise hop-distance HISTOGRAM from `seeds` (d in 1..rounds), with
    * exact-integer cumulative shares: (d, n_pairs, cum_pairs, cum_ppm).
    * The crawl/link-graph health readout behind the "effective diameter"
    * number — the smallest d whose cum_ppm ≥ 900000 is the 90th-
    * percentile effective diameter (read off the table; no float, no
    * interpolation). All-nodes seeding gives the exact hop-bounded
    * distribution on small graphs; on a 100 TB link graph seeds are a
    * deterministic sample (the textbook ANF/HyperANF setting — this is
    * the exact small-seed-set primitive those sketches approximate).
    *
    * One [[multiSourceBfs]] + a d-keyed count + a ≤rounds-row cumulative
    * window (single-partition by construction — the frame is
    * rounds-sized model state, never data-sized). */
  def distanceHistogram(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = multiSourceBfs(edges, seeds, rounds)
      .where(col("d") >= 1L)
      .groupBy(col("d")).agg(count(lit(1)).as("n_pairs"))
    val total = hist.agg(sum(col("n_pairs")).as("total"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum_pairs", sum(col("n_pairs")).over(w))
      .crossJoin(broadcast(total))
      .select(col("d"), col("n_pairs"), col("cum_pairs"),
        expr("(cum_pairs * 1000000) div total").as("cum_ppm"))
  }

  /** Personalized PageRank: [[integerPageRank]]'s exact-integer recurrence
    * with the teleport vector concentrated on a seed set instead of
    * uniform — the "authority relative to a trusted core" ranking
    * (TrustRank-style crawl curation: seeds = vetted hosts, low PPR =
    * far from anything trusted).
    *
    * r_0(v) = [v ∈ S]·(M div |S|);
    * r_{t+1}(v) = [v ∈ S]·(15·(M div |S|)) div 100
    *   + (85 · Σ_{u→v} (r_t(u) div deg(u))) div 100.
    * Every division floors non-negative longs → engine-order independent;
    * 85·Σ ≤ 85·M < 2^63. Rows with r = 0 are dropped (rank mass is sparse
    * around the seeds; the zero tail is the unreached graph), so state
    * stays proportional to the reached set, not the node universe. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      mass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    val e = PinnedCache.pin(edges.toDF("src", "dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = PinnedCache.pin(e.join(deg, "src"))
    val sd = PinnedCache.pin(seeds.toDF("node").distinct())
    val nSeeds = sd.count()
    require(nSeeds > 0, "empty seed set")
    val r0 = mass / nSeeds
    val tel = (15L * r0) / 100L
    var ranks = sd.withColumn("r", lit(r0)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(expr("(85 * sum(c)) div 100").as("c"))
      ranks = contrib
        .join(sd.withColumn("tel", lit(tel)), Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("c"), lit(0L)) + coalesce(col("tel"), lit(0L))).as("r"))
        .where(col("r") > 0)
        .localCheckpoint(true)
    }
    ranks
  }

  /** Synchronous label propagation (fixed rounds) — community detection
    * over an undirected edge list `(a, b)` (a < b, deduplicated): labels
    * start as node ids; each round every node adopts the most frequent
    * label among its NEIGHBORS, ties to the smallest label — a total
    * order, so the whole run is deterministic and engine-replayable (the
    * [[integerPageRank]] fixed-iteration contract; convergence detection
    * never decides results). Communities complement the other graph
    * tiers: CC finds connectivity, k-core density, triangles cohesion —
    * LPA finds the mesoscale grouping dedup/source analysis wants.
    *
    * Per round: one label join onto the symmetric edges + one
    * (node, label) partial-agg count + one argmin-struct pick per node —
    * all node-keyed shuffles, lineage flattened per round. */
  /** INCREMENTAL label propagation — the q164 "incremental ≡ recompute"
    * discipline applied to communities: given the base graph's final
    * `prevLabels` (= [[labelPropagation]](baseEdges, rounds)) and a
    * `deltaEdges` wave, produce labels IDENTICAL to re-running the batch
    * operator over base ∪ delta, by re-propagating only on the touched
    * subgraph.
    *
    * Exactness argument (synchronous LPA, fixed `rounds` = R): round-R
    * labels are a pure function of each node's dependency cone — by
    * induction, label_r(v) can differ from the base run's only if a
    * delta ENDPOINT lies within r−1 hops of v in the union graph, so
    * nodes beyond R−1 hops keep their base labels verbatim. Recomputing
    * the ≤R-hop ball exactly needs initial labels of the ≤2R-hop ball
    * and the edges incident to the ≤(2R−1)-hop ball — so the re-run is
    * the SAME recurrence restricted to that subgraph (same node-id
    * inits, same argmin tie rule), and its outputs are taken only for
    * the ≤R ball. No approximation anywhere; IncrementalLpaSpec pins
    * equality against the one-shot batch run per wave.
    *
    * Scale shape: the ball grows by frontier joins (cost ∝ touched
    * region); the re-propagation shuffles only ball-incident edges. On
    * the sparse near-dup graphs this maintains nightly, the ball is the
    * delta's neighborhood, not the corpus — the q164 cost argument with
    * a 2R−1 horizon instead of stars ∪ delta. */
  def incrementalLabelPropagation(prevLabels: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    def norm(df: DataFrame) = df.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val bE = norm(baseEdges)
    val dE = norm(deltaEdges)
    val all = bE.unionByName(dE)
    val sym = PinnedCache.pin(
      all.unionByName(all.select(col("b").as("a"), col("a").as("b"))).distinct())
    val seeds = dE.select(col("a").as("node"))
      .unionByName(dE.select(col("b").as("node"))).distinct()
    // BFS ball to 2R-1 hops over the union graph
    var ball = seeds.withColumn("d", lit(0L)).localCheckpoint(true)
    for (i <- 1 to 2 * rounds - 1) {
      val frontier = ball.where(col("d") === (i - 1).toLong)
        .select(col("node").as("a"))
      ball = ball.unionByName(
          sym.join(frontier, "a").select(col("b").as("node"), lit(i.toLong).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val ballAll = ball.select(col("node"))
    val take = ball.where(col("d") <= rounds.toLong).select(col("node"))
    // edges incident to the ball (sym is symmetric, so a-side covers all)
    val subEdges = sym.join(ballAll.withColumnRenamed("node", "a"), "a")
    val recomputed = labelPropagation(subEdges, rounds)
      .join(take, "node")
    prevLabels.toDF("node", "lab")
      .join(take, Seq("node"), "left_anti")
      .unionByName(recomputed)
  }

  /** INCREMENTAL PageRank — the q164/q253 "incremental ≡ recompute"
    * discipline applied to the last batch-only graph operator with a
    * nightly-maintenance story: given the base graph's final ranks
    * (= [[integerPageRank]](baseEdges, iters)) and a DISJOINT
    * `deltaEdges` wave, produce ranks IDENTICAL to re-running the batch
    * operator over base ∪ delta, recomputing only the delta's forward
    * influence cone.
    *
    * Exactness argument (fixed `iters` = R, integer recurrence): a
    * changed input at round t is either a new in-edge or a changed
    * out-degree — both anchored at delta ENDPOINTS — and changes
    * propagate strictly FORWARD along out-edges, one hop per round. So
    * r_R(v) can differ from the base run only if v lies within R forward
    * hops of a delta endpoint (the `take` ball). Recomputing take-ball
    * values exactly needs, by downward induction, the FULL in-edge set
    * of every node within R−1 BACKWARD hops of the ball (round-(R−t)
    * values are consumed only for nodes at backward depth ≤ t; depth-R
    * nodes contribute through their exact r_0 init alone, and any
    * corruption of their later values flows only into rounds the take
    * ball never reads). The restricted run therefore replays the SAME
    * recurrence over edges whose dst lies in the (R−1)-hop backward
    * ball, with the GLOBAL out-degrees and the GLOBAL r_0 = M div N —
    * one linear pass each, no iteration. No approximation anywhere;
    * IncrementalPageRankSpec pins equality against the one-shot batch
    * run per wave (including an off-by-one-sensitive cycle graph).
    *
    * GLOBALITY GUARD: r_0 and the teleport constant divide by N = the
    * src-node count, so a delta that introduces a NEW src node shifts
    * every node's teleport share — there is no locality to exploit and
    * the operator falls back to the batch recurrence (exactness over
    * cleverness; the spec pins the fallback path too). Since
    * src(base) ⊆ src(base ∪ delta), a count comparison decides set
    * equality.
    *
    * Scale shape: both balls grow by frontier joins (cost ∝ the touched
    * region, the bfsDistances plan); the re-iteration shuffles only
    * ball-incident edges. On the sparse near-dup graphs this maintains
    * nightly (q304), the cone is the delta's neighborhood, not the
    * corpus. Requires in-degree ≥ 1 everywhere (the [[integerPageRank]]
    * contract; symmetrized graphs qualify) and base ∩ delta = ∅ (edge
    * multiplicity feeds degree counts). */
  def incrementalPageRank(prevRanks: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, iters: Int,
      mass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iterations must be in [1,50], got $iters")
    val bE = baseEdges.toDF("src", "dst")
    val dE = deltaEdges.toDF("src", "dst")
    val all = PinnedCache.pin(bE.unionByName(dE))
    val deg = PinnedCache.pin(
      all.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val n = deg.count()
    require(n > 0, "empty graph")
    if (bE.select(col("src")).distinct().count() != n)
      return integerPageRank(all, iters, mass)
    val r0 = mass / n
    val base = (15L * r0) / 100L
    val seeds = dE.select(col("src").as("node"))
      .unionByName(dE.select(col("dst").as("node"))).distinct()
    // forward influence ball: nodes within `iters` hops DOWNSTREAM of a
    // delta endpoint — the only ranks that can differ from the base run
    var fwd = seeds.withColumn("d", lit(0L)).localCheckpoint(true)
    for (i <- 1 to iters) {
      val frontier = fwd.where(col("d") === (i - 1).toLong)
        .select(col("node").as("src"))
      fwd = fwd.unionByName(
          all.join(frontier, "src")
            .select(col("dst").as("node"), lit(i.toLong).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val take = PinnedCache.pin(fwd.select(col("node")))
    // dependency ball: in-edges of nodes within iters-1 hops UPSTREAM of
    // the take ball feed the restricted recurrence; deeper nodes enter
    // through their exact r_0 init only
    var bwd = take.withColumn("d", lit(0L)).localCheckpoint(true)
    for (i <- 1 until iters) {
      val frontier = bwd.where(col("d") === (i - 1).toLong)
        .select(col("node").as("dst"))
      bwd = bwd.unionByName(
          all.join(frontier, "dst")
            .select(col("src").as("node"), lit(i.toLong).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val subEdges = all.join(bwd.select(col("node").as("dst")), "dst")
      .select(col("src"), col("dst"))
    // the SAME recurrence as integerPageRank, with GLOBAL deg and r0
    val withDeg = PinnedCache.pin(subEdges.join(deg, "src"))
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .withColumn("r", lit(r0)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      ranks = withDeg
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
        .select(col("node"), (lit(base) + expr("(85 * s) div 100")).as("r"))
        .localCheckpoint(true)
    }
    prevRanks.toDF("node", "r")
      .join(take, Seq("node"), "left_anti")
      .unionByName(ranks.join(take, Seq("node")))
  }

  /** Integer KATZ centrality — the eigen tier's attenuated-walk member
    * (PageRank normalizes by out-degree; HITS rescales by the max; Katz
    * counts ALL incoming walks, geometrically damped by length):
    *   r₀(v) = 10⁶;  r_{t+1}(v) = 10⁶ + (Σ_{u→v} r_t(u)) div alphaDen
    * — α = 1/alphaDen, one floor per NODE per round (sum first, divide
    * once — order-free), so the fixed-iteration result is bit-identical
    * across engines and replays as chained CTEs (the [[integerPageRank]]
    * discipline; fixed small iters, rank order is the contract — Katz
    * formally converges only for α < 1/λmax, but the truncated sum is a
    * deterministic statistic regardless). Nodes with no in-edges keep
    * the base injection 10⁶. Overflow: r grows ≤ ×(deg_max/alphaDen)
    * per round — 4 rounds at deg_max ≈ 10³, alphaDen 8 stays ~10¹⁴.
    *
    * Shape: per round one rank-onto-edges join + one dst-keyed
    * map-side-combinable sum — Pregel-shaped, like [[integerPageRank]]
    * minus the degree join. */
  def integerKatz(edges: DataFrame, iters: Int, alphaDen: Long = 8L): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters in [1,20]")
    require(alphaDen >= 2, "alphaDen >= 2")
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var r = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val in = e.join(r.select(col("node").as("src"), col("r")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("r")).as("s"))
      r = nodes.join(in, Seq("node"), "left")
        .withColumn("r", lit(1000000L) +
          expr(s"coalesce(s, 0L) div ${alphaDen}L"))
        .select(col("node"), col("r"))
        .localCheckpoint(true)
    }
    r
  }

  /** [[integerKatz]] returning the full TRAJECTORY (node, t, r) for
    * t = 0..iters — the stored state [[incrementalKatz]] replays its
    * boundary inputs from (the [[integerHitsTrace]] pattern: batch runs
    * persist what maintenance needs). iters·|nodes| rows. */
  def integerKatzTrace(edges: DataFrame, iters: Int,
      alphaDen: Long = 8L): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters in [1,20]")
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var r = nodes.withColumn("r", lit(1000000L))
    var out = r.withColumn("t", lit(0L))
    for (t <- 1 to iters) {
      val in = e.join(r.select(col("node").as("src"), col("r")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("r")).as("s"))
      r = nodes.join(in, Seq("node"), "left")
        .withColumn("r", lit(1000000L) +
          expr(s"coalesce(s, 0L) div ${alphaDen}L"))
        .select(col("node"), col("r"))
        .localCheckpoint(true)
      out = out.unionByName(r.withColumn("t", lit(t.toLong)))
    }
    out.select(col("node"), col("t"), col("r"))
  }

  /** INCREMENTAL [[integerKatz]] — the eigen tier's CLEANEST maintained
    * form (no 1/N like PageRank q304, no global max-rescale like HITS
    * q310: the Katz recurrence is purely local, so the ball argument
    * has no globality guard at all). A new edge (a, b) can change
    * r_t(v) only if v lies within t−1 FORWARD hops of b — influence
    * enters at b on iteration 1 and travels one edge per iteration —
    * so the affected set is the forward ball of radius iters−1 from
    * the delta dst endpoints over the FULL graph (settled/frontier
    * expansion), plus any node absent from the base trace (new nodes).
    * Everything else keeps its final base rank VERBATIM (anti-join);
    * the recurrence replays restricted to edges INTO affected nodes,
    * reading unaffected in-neighbor values per iteration from the
    * stored base TRAJECTORY (exact by induction: a node unaffected at
    * radius t has r_t ≡ base r_t). Cost ∝ the delta's downstream
    * neighborhood — the nightly link-graph maintenance shape.
    *
    * SHUFFLE SHAPE (r13, measured by MaintenanceCostSpec): the graph is
    * never re-shuffled. The old plan opened with
    * `(base ∪ delta).distinct()` — a full-graph exchange that made
    * "maintenance" shuffle 2× the RECOMPUTE at 1M edges. Now base is
    * only ever SCANNED: ball expansion and the edges-into-ball
    * restriction join against the frontier/ball (localCheckpoint-ed,
    * so AQE sees exact small sizes and broadcasts), the base∩delta
    * dedup happens AFTER ball restriction (only ball edges are ever
    * re-aggregated, so duplicates elsewhere cannot affect the output),
    * and new-node detection probes the trace with the broadcast delta
    * endpoints instead of distinct-ing the full node set. Shuffled
    * bytes ∝ ball; input scans ∝ graph (iters cached scans — the part
    * no maintenance can avoid without an index). */
  def incrementalKatz(prevTrace: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, iters: Int, alphaDen: Long = 8L): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters in [1,20]")
    def norm(df: DataFrame) = df.toDF("src", "dst")
    val base = norm(baseEdges)
    val delta = norm(deltaEdges).distinct().localCheckpoint(true)
    val union = base.unionByName(delta) // scanned below, never shuffled
    val trace = prevTrace.toDF("node", "t", "r").localCheckpoint(true)
    // size-gated hints, decided on the checkpointed trace (∝ node count
    // × iters — the graph-scale signal this op has cheapest access to)
    val mh = frontierHinter(trace)
    // a node is new iff it touches a delta edge and is absent from the
    // trace: probe the trace's t=0 slice with the (small, broadcast)
    // delta endpoints — no full-node-set distinct
    val deltaEnds = mh(delta.select(col("src").as("node"))
      .unionByName(delta.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true))
    val knownEnds = trace.where(col("t") === 0L).select(col("node"))
      .join(deltaEnds, Seq("node"), "left_semi")
    val newNodes = deltaEnds.join(knownEnds, Seq("node"), "left_anti")
    var aff = mh(delta.select(col("dst").as("node")).distinct()
      .unionByName(newNodes).distinct().localCheckpoint(true))
    var frontier = aff
    for (_ <- 1 until iters) {
      frontier = mh(union
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(aff, Seq("node"), "left_anti")
        .localCheckpoint(true))
      aff = mh(aff.unionByName(frontier).localCheckpoint(true))
    }
    // edges INTO the affected region — the only recurrence that replays;
    // the base-vs-delta dedup happens HERE, on the ball-local edge set
    // (edges outside the ball are never re-aggregated, so duplicates
    // there cannot affect the output)
    val affIn = mh(union
      .join(aff.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .distinct()
      .localCheckpoint(true))
    var rAff = aff.withColumn("r", lit(1000000L))
    for (t <- 1 to iters) {
      val srcVals = rAff.select(col("node").as("src"), col("r"))
        .unionByName(trace.where(col("t") === (t - 1).toLong)
          .select(col("node").as("src"), col("r"))
          .join(aff.select(col("node").as("src")), Seq("src"), "left_anti"))
      val in = affIn.join(srcVals, "src")
        .groupBy(col("dst").as("node")).agg(sum(col("r")).as("s"))
      rAff = mh(aff.join(in, Seq("node"), "left")
        .withColumn("r", lit(1000000L) +
          expr(s"coalesce(s, 0L) div ${alphaDen}L"))
        .select(col("node"), col("r"))
        .localCheckpoint(true))
    }
    trace.where(col("t") === iters.toLong).select(col("node"), col("r"))
      .join(aff, Seq("node"), "left_anti")
      .unionByName(rAff)
  }

  /** Integer-ppm MODULARITY readout of a community assignment — the
    * quality scalar a curator reads next to the assignment itself (did
    * LPA/CC produce real mesoscale structure, or noise?). For undirected
    * edges `(a, b)` (each edge once, either orientation) and `labels`
    * (node, lab), the per-community contribution to Newman modularity
    *   Q_c = e_c/m − (deg_c / 2m)²  =  (4m·e_c − deg_c²) / (4m²)
    * in parts-per-million. Exactness: ONE floor division per community
    * — but Q_c can be negative and Spark `div` truncates while DuckDB
    * `//` floors (the [[TextAnalysis.vocabKlDrift]] hazard), so the
    * dividend is shifted by +4m²·10⁶ (≥ the worst case deg_c² = (2m)²,
    * making it non-negative, where floor ≡ trunc) and 10⁶ is subtracted
    * back after the division — exact because (x + n·d) div d = x div d
    * + n. The division rides decimal(38,0) rails (see [[shiftedQppm]]):
    * the worst-case shifted dividend 5·10⁶·m² stays inside 38 digits
    * for m ≤ ~1.4·10¹⁵ edges — no overflow ceiling at any physical
    * graph size (the oracle rides HUGEINT for the same reason).
    *
    * CONTRACT: `edges` must be CANONICAL — distinct rows, each
    * undirected edge in exactly ONE orientation, no self-loops. m, deg
    * and intra count input rows verbatim (no internal dedup — that is
    * what lets [[incrementalModularity]]'s base ∪ delta `distinct()`
    * reproduce this readout exactly; a duplicated or double-oriented
    * input silently diverges between the batch and maintained forms).
    *
    * Shape: one degree aggregate, one label join + community rollup, one
    * intra-edge join + rollup, one 1-row m broadcast — all partial-agg
    * friendly, output is community-sized. Communities whose edges all
    * cross the boundary report intra_edges = 0 (LEFT join + coalesce). */
  def modularityByCommunity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val lab = labels.toDF("node", "lab")
      .select(col("node").cast("long").as("node"), col("lab").cast("long").as("lab"))
    val m = e.agg(count(lit(1)).as("m"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val byLab = deg.join(lab, "node")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val intra = e
      .join(lab.select(col("node").as("a"), col("lab").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("lab").as("lb")), "b")
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("intra_edges"))
    byLab.join(intra, Seq("lab"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("q_ppm", shiftedQppm)
      .select(col("lab").as("label"), col("n_nodes"), col("deg_sum"),
        col("intra_edges"), col("q_ppm"))
  }

  /** Integer-ppm CONDUCTANCE per community — the SECOND standard
    * community-quality readout next to [[modularityByCommunity]] (the
    * two answer different questions: modularity scores internal density
    * against a random-graph null; conductance scores the BOUNDARY —
    * how leaky the community is):
    *   φ(c) = cut_c / min(vol_c, 2m − vol_c)
    * where vol_c = Σ deg over members and cut_c = edges with exactly
    * one endpoint in c, in parts-per-million with ONE floor division
    * per community (dividend non-negative, so Spark trunc ≡ DuckDB
    * floor — no shift needed, unlike the modularity Q which can go
    * negative). A community spanning the WHOLE graph (min = 0) raises
    * loudly — φ is undefined there, and a silent 0 would read as
    * "perfectly tight". Labeled nodes absent from the edge list are
    * excluded (degree comes from edges — the house convention).
    * CONTRACT: `edges` must be CANONICAL — distinct rows, each
    * undirected edge in exactly ONE orientation, no self-loops. m, vol
    * and cut count input rows verbatim (no internal dedup — that is
    * what lets [[incrementalConductance]]'s base ∪ delta `distinct()`
    * reproduce this readout exactly; a duplicated or double-oriented
    * input silently diverges between the batch and maintained forms).
    * Output: (label, n_nodes, vol, cut, phi_ppm). */
  def conductanceByCommunity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val lab = labels.toDF("node", "lab")
      .select(col("node").cast("long").as("node"), col("lab").cast("long").as("lab"))
    val m = e.agg(count(lit(1)).as("m"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val byLab = deg.join(lab, "node")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    val sided = e
      .join(lab.select(col("node").as("a"), col("lab").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("lab").as("lb")), "b")
      .where(col("la") =!= col("lb"))
    val cut = sided.select(col("la").as("lab"))
      .unionByName(sided.select(col("lb").as("lab")))
      .groupBy(col("lab")).agg(count(lit(1)).as("cut"))
    byLab.join(cut, Seq("lab"), "left")
      .withColumn("cut", coalesce(col("cut"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("phi_ppm", expr(
        """case when least(vol, 2L * m - vol) = 0L then
          |  cast(raise_error('conductanceByCommunity: community spans the whole graph - phi undefined') as bigint)
          |else (cast(cut as decimal(38,0)) * 1000000) div least(vol, 2L * m - vol) end""".stripMargin))
      .select(col("lab").as("label"), col("n_nodes"), col("vol"),
        col("cut"), col("phi_ppm"))
  }

  /** INCREMENTAL [[conductanceByCommunity]] — the FOURTEENTH maintained
    * form, twin to [[incrementalModularity]] over the boundary readout:
    * given the base stats, the base and maintained label assignments,
    * and an additive edge wave, recount (n_nodes, vol, cut) ONLY for
    * the AFFECTED communities — the labels (old and new) of any
    * relabeled node plus the labels of delta-edge endpoints; every
    * other community's stats pass through VERBATIM. Soundness for the
    * CUT column (the one new argument vs modularity): an edge whose
    * relabeled endpoint moves c1 → c2 changes cross-status only for
    * c1, c2, or the other endpoint's own community when it IS c1/c2 —
    * all in the affected set; for any third community the edge's
    * one-endpoint-inside status is unchanged. GLOBALITY (the q304/q318
    * 1/N shape): the edge total m enters every φ via 2m − vol, so
    * phi_ppm re-evaluates for ALL rows — a broadcast-scalar map over
    * community-count rows; the graph-sized recount stays pruned.
    *
    * RELABEL DETECTION (r13 verdict item 3): with `lpaRounds = 0`
    * (arbitrary label changes allowed) the relabel diff is a full-outer
    * join over the NODE universe — the one remaining node-sized
    * exchange in this form. When the labels are maintained by
    * [[incrementalLabelPropagation]] with `rounds = R`, only nodes in
    * the delta's ≤R-hop union-graph ball can have moved (that operator
    * takes recomputed labels for exactly `d <= R`; everything else
    * passes through verbatim) — so passing `lpaRounds = R` restricts
    * the diff to the ball: a frontier-join BFS (shuffle ∝ ball, scans
    * hinted via [[frontierHinter]]) plus broadcast semi-joins onto the
    * two assignments, which then diff at ball size. The ball BFS runs
    * to R hops only — strictly smaller than the 2R−1 ball the label
    * maintenance itself already paid for. */
  def incrementalConductance(prevStats: DataFrame, prevLabels: DataFrame,
      newLabels: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, lpaRounds: Int = 0): DataFrame = {
    require(lpaRounds >= 0 && lpaRounds <= 10, "lpaRounds in [0,10]")
    def norm(df: DataFrame) = df.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    def labs(df: DataFrame) = df.toDF("node", "lab")
      .select(col("node").cast("long").as("node"), col("lab").cast("long").as("lab"))
    // base is SCANNED repeatedly (the gate count + semi-joins) — the
    // caller pins it (every query/spec does); an internal checkpoint
    // here double-materialized it, measured +2 s on q318's fixture
    val base = norm(baseEdges)
    // size-gated hints (the [[frontierHinter]] trade), decided on base
    val mh = frontierHinter(base)
    val delta = mh(norm(deltaEdges).distinct().localCheckpoint(true))
    // NO full-graph distinct (the r13 incrementalKatz finding): base is
    // canonical by [[conductanceByCommunity]]'s contract, delta is
    // distinct-ed above, and the base∩delta dedup happens AFTER the
    // ball restriction (`incident` below — the only place union rows
    // are COUNTED); the global edge total is three cheap counts, not a
    // full exchange: m = |base| + |delta| − |base ∩ delta| (the overlap
    // probe scans base against the broadcast delta)
    val union = base.unionByName(delta)
    val mTotal = base.count() + delta.count() -
      base.join(delta, Seq("a", "b"), "left_semi").count()
    val prevL = labs(prevLabels)
    val newL = labs(newLabels).localCheckpoint(true)
    // delta endpoints: hinted so every join against a node-sized
    // assignment below is a broadcast SCAN, never an exchange of the
    // assignment (the r14 reshape — the unhinted version cost a fixed
    // ~19 MB newL exchange regardless of delta size)
    val dNodes = mh(delta.select(col("a").as("node"))
      .unionByName(delta.select(col("b").as("node"))).distinct()
      .localCheckpoint(true))
    val changed = if (lpaRounds == 0) {
      // arbitrary relabels: the diff must scan the whole assignment
      newL.as("n")
        .join(prevL.as("p"), col("n.node") === col("p.node"), "full")
        .where(col("p.lab").isNull || col("n.lab").isNull ||
          col("p.lab") =!= col("n.lab"))
    } else {
      // LPA-maintained labels: only the delta's <=R-hop ball can move.
      // BFS over the symmetric union with hinted frontiers — shuffle is
      // the ball-sized groupBy-min, never a node-universe exchange.
      val symU = union
        .unionByName(union.select(col("b").as("a"), col("a").as("b")))
      var ball = dNodes.withColumn("d", lit(0L)).localCheckpoint(true)
      for (i <- 1 to lpaRounds) {
        val frontier = mh(ball.where(col("d") === (i - 1).toLong)
          .select(col("node").as("a")))
        ball = ball.unionByName(symU.join(frontier, "a")
            .select(col("b").as("node"), lit(i.toLong).as("d")))
          .groupBy(col("node")).agg(min(col("d")).as("d"))
          .localCheckpoint(true)
      }
      val ballN = mh(ball.select(col("node")))
      newL.join(ballN, Seq("node"), "left_semi").as("n")
        .join(prevL.join(ballN, Seq("node"), "left_semi").as("p"),
          col("n.node") === col("p.node"), "full")
        .where(col("p.lab").isNull || col("n.lab").isNull ||
          col("p.lab") =!= col("n.lab"))
    }
    val deltaEnds = newL.join(dNodes, Seq("node"), "left_semi")
      .select(col("lab"))
    val affected = mh(changed.select(col("n.lab").as("lab"))
      .unionByName(changed.select(col("p.lab").as("lab")))
      .where(col("lab").isNotNull)
      .unionByName(deltaEnds)
      .distinct().localCheckpoint(true))
    val affNodes = mh(newL.join(affected, Seq("lab"), "left_semi")
      .localCheckpoint(true))
    // edges with >= 1 endpoint in an affected community — the ONLY rows
    // recounting aggregates over; dedup of base∩delta overlap happens
    // here, on the ball-local set (≡ restricting the old full-distinct
    // list, since distinct and a row predicate commute)
    val incident = mh(union
      .join(affNodes.select(col("node").as("a")), Seq("a"), "left_semi")
      .unionByName(union
        .join(affNodes.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      .distinct().localCheckpoint(true))
    // every edge at an affected node is incident, so degrees recount
    // from the incident set alone
    val symInc = incident
      .unionByName(incident.select(col("b").as("a"), col("a").as("b")))
    val deg = symInc.join(affNodes.select(col("node").as("a")), Seq("a"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val byLab = deg.join(affNodes, "node")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    // cut recount: the OTHER endpoint's label comes from the full
    // assignment — but only incident-edge ENDPOINTS are ever consulted,
    // so restrict the assignment to them first (one broadcast-semi scan
    // of newL); both label joins below then run against a ball-sized
    // hinted frame instead of exchanging the node universe (r14)
    val ends = incident.select(col("a").as("node"))
      .unionByName(incident.select(col("b").as("node"))).distinct()
    val labInc = mh(newL.join(mh(ends), Seq("node"), "left_semi")
      .localCheckpoint(true))
    val sided = incident
      .join(labInc.select(col("node").as("a"), col("lab").as("la")), "a")
      .join(labInc.select(col("node").as("b"), col("lab").as("lb")), "b")
      .where(col("la") =!= col("lb"))
    val cut = sided.select(col("la").as("lab"))
      .unionByName(sided.select(col("lb").as("lab")))
      .join(affected, Seq("lab"), "left_semi")
      .groupBy(col("lab")).agg(count(lit(1)).as("cut"))
    val recount = byLab.join(cut, Seq("lab"), "left")
      .withColumn("cut", coalesce(col("cut"), lit(0L)))
    val verbatim = prevStats
      .select(col("label").as("lab"), col("n_nodes"), col("vol"), col("cut"))
      .join(affected, Seq("lab"), "left_anti")
    verbatim.unionByName(recount)
      .withColumn("m", lit(mTotal))
      .withColumn("phi_ppm", expr(
        """case when least(vol, 2L * m - vol) = 0L then
          |  cast(raise_error('incrementalConductance: community spans the whole graph - phi undefined') as bigint)
          |else (cast(cut as decimal(38,0)) * 1000000) div least(vol, 2L * m - vol) end""".stripMargin))
      .select(col("lab").as("label"), col("n_nodes"), col("vol"),
        col("cut"), col("phi_ppm"))
  }

  /** The floor-safe ppm division shared by [[modularityByCommunity]] and
    * [[incrementalModularity]] (expects columns m, intra_edges, deg_sum).
    * All products ride decimal(38,0) rails (the [[degreeAssortativity]]
    * convention — the oracle rides HUGEINT), so there is NO long-overflow
    * ceiling: the worst-case shifted dividend 5·10⁶·m² (at deg_c = 2·e_c,
    * e_c = m/2) stays inside 38 digits for m ≤ ~1.4·10¹⁵ edges — three
    * orders past a 100 TB link graph (~10¹²). The +4m²·10⁶ shift keeps
    * the dividend non-negative (Q_c ≥ −1), so Spark decimal `div`
    * (trunc) ≡ DuckDB `//` (floor); the quotient is a shifted ppm
    * ≤ 2·10⁶, safely inside `div`'s long result type. (The pre-r13 long
    * rail raised at m ≥ 1.358e6 — loud but a toy-size ceiling; decimal
    * keeps the loudness irrelevant by removing the overflow.) */
  private def shiftedQppm: org.apache.spark.sql.Column = expr(
    """(1000000 * (4 * cast(m as decimal(38,0)) * intra_edges
      |            - cast(deg_sum as decimal(38,0)) * deg_sum)
      | + 4000000 * cast(m as decimal(38,0)) * cast(m as decimal(38,0)))
      |div (4 * cast(m as decimal(38,0)) * cast(m as decimal(38,0)))
      |- 1000000""".stripMargin)

  /** INCREMENTAL [[modularityByCommunity]] — the quality readout joins
    * the incremental family (CC q164, LPA q253, PR q304, triangles q306,
    * k-core q308, HITS q310, distances q311): given the base stats, the
    * base and maintained label assignments (the latter from
    * [[incrementalLabelPropagation]], proven ≡ batch), and an additive
    * edge wave, recount (n_nodes, deg_sum, intra_edges) ONLY for the
    * AFFECTED communities — the labels (old and new) of any relabeled
    * node plus the labels of delta-edge endpoints; every other
    * community's stats pass through VERBATIM (anti-join, never
    * recomputed). Soundness: deg_sum moves only via delta edges
    * (endpoints' labels are affected), intra_edges via delta edges or
    * membership changes, n_nodes via membership changes or new nodes
    * (delta endpoints) — so unaffected stats are exactly the base stats.
    *
    * GLOBALITY note (the q304 1/N shape): the edge total m enters every
    * community's Q_c, so q_ppm is re-evaluated for ALL rows — but that
    * is a broadcast-scalar map over community-COUNT rows; the
    * graph-sized work (degree/intra recount) is pruned to the affected
    * communities' subgraph, cost ∝ touched region.
    *
    * RELABEL DETECTION mirrors [[incrementalConductance]] (r14): pass
    * `lpaRounds = R` when the labels are maintained by
    * [[incrementalLabelPropagation]] with `rounds = R` — the relabel
    * diff then runs ball-restricted (broadcast semi-joins) instead of
    * full-outer-joining the node universe. */
  def incrementalModularity(prevStats: DataFrame, prevLabels: DataFrame,
      newLabels: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, lpaRounds: Int = 0): DataFrame = {
    require(lpaRounds >= 0 && lpaRounds <= 10, "lpaRounds in [0,10]")
    def norm(df: DataFrame) = df.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    def labs(df: DataFrame) = df.toDF("node", "lab")
      .select(col("node").cast("long").as("node"), col("lab").cast("long").as("lab"))
    // base is SCANNED repeatedly (the gate count + semi-joins) — the
    // caller pins it (every query/spec does); an internal checkpoint
    // here double-materialized it, measured +2 s on q318's fixture
    val base = norm(baseEdges)
    // size-gated hints (the [[frontierHinter]] trade), decided on base
    val mh = frontierHinter(base)
    val delta = mh(norm(deltaEdges).distinct().localCheckpoint(true))
    // NO full-graph distinct (the r13 incrementalKatz finding; the
    // incrementalConductance reshape mirrored here): base is canonical
    // by [[modularityByCommunity]]'s contract, and the base∩delta dedup
    // happens on the ball-local `incident` set — the only rows the
    // recount aggregates. m = |base| + |delta| − |base ∩ delta| via
    // three cheap counts (the overlap probe scans base against the
    // broadcast delta)
    val union = base.unionByName(delta)
    val mTotal = base.count() + delta.count() -
      base.join(delta, Seq("a", "b"), "left_semi").count()
    val prevL = labs(prevLabels)
    val newL = labs(newLabels).localCheckpoint(true)
    // hinted delta endpoints + the optional ball-restricted relabel
    // diff — the incrementalConductance r14 reshape, verbatim
    val dNodes = mh(delta.select(col("a").as("node"))
      .unionByName(delta.select(col("b").as("node"))).distinct()
      .localCheckpoint(true))
    val changed = if (lpaRounds == 0) {
      newL.as("n")
        .join(prevL.as("p"), col("n.node") === col("p.node"), "full")
        .where(col("p.lab").isNull || col("n.lab").isNull ||
          col("p.lab") =!= col("n.lab"))
    } else {
      val symU = union
        .unionByName(union.select(col("b").as("a"), col("a").as("b")))
      var ball = dNodes.withColumn("d", lit(0L)).localCheckpoint(true)
      for (i <- 1 to lpaRounds) {
        val frontier = mh(ball.where(col("d") === (i - 1).toLong)
          .select(col("node").as("a")))
        ball = ball.unionByName(symU.join(frontier, "a")
            .select(col("b").as("node"), lit(i.toLong).as("d")))
          .groupBy(col("node")).agg(min(col("d")).as("d"))
          .localCheckpoint(true)
      }
      val ballN = mh(ball.select(col("node")))
      newL.join(ballN, Seq("node"), "left_semi").as("n")
        .join(prevL.join(ballN, Seq("node"), "left_semi").as("p"),
          col("n.node") === col("p.node"), "full")
        .where(col("p.lab").isNull || col("n.lab").isNull ||
          col("p.lab") =!= col("n.lab"))
    }
    val deltaEnds = newL.join(dNodes, Seq("node"), "left_semi")
      .select(col("lab"))
    val affected = mh(changed.select(col("n.lab").as("lab"))
      .unionByName(changed.select(col("p.lab").as("lab")))
      .where(col("lab").isNotNull)
      .unionByName(deltaEnds)
      .distinct().localCheckpoint(true))
    val affNodes = mh(newL.join(affected, Seq("lab"), "left_semi")
      .localCheckpoint(true))
    // every edge at an affected node (degrees and intra-edges of
    // affected communities only ever touch these rows)
    val incident = mh(union
      .join(affNodes.select(col("node").as("a")), Seq("a"), "left_semi")
      .unionByName(union
        .join(affNodes.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      .distinct().localCheckpoint(true))
    val symInc = incident
      .unionByName(incident.select(col("b").as("a"), col("a").as("b")))
    val deg = symInc.join(affNodes.select(col("node").as("a")), Seq("a"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val byLab = deg.join(affNodes, "node")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val intra = incident
      .join(affNodes.select(col("node").as("a"), col("lab").as("la")), "a")
      .join(affNodes.select(col("node").as("b"), col("lab").as("lb")), "b")
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("intra_edges"))
    val recount = byLab.join(intra, Seq("lab"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
    val verbatim = prevStats
      .select(col("label").as("lab"), col("n_nodes"), col("deg_sum"),
        col("intra_edges"))
      .join(affected, Seq("lab"), "left_anti")
    verbatim.unionByName(recount)
      .withColumn("m", lit(mTotal))
      .withColumn("q_ppm", shiftedQppm)
      .select(col("lab").as("label"), col("n_nodes"), col("deg_sum"),
        col("intra_edges"), col("q_ppm"))
  }

  /** One synchronous LOUVAIN-STYLE greedy move pass in exact integer
    * arithmetic — the community-REFINEMENT member of the community tier
    * ([[labelPropagation]] proposes, [[modularityByCommunity]] scores,
    * this IMPROVES): every node simultaneously moves to the candidate
    * community (its own, or any neighbor's) maximizing the modularity
    * gain. Candidates are compared by the cross-multiplied integer
    * score
    *   score(i → c) = 2m·k_i,in(c) − k_i·(Σtot(c) − [c = cur_i]·k_i)
    * which orders candidate targets exactly as Newman ΔQ does (the
    * removal-from-own-community term is constant across targets, and
    * 2m² > 0 scales ΔQ monotonically) — no division anywhere, so both
    * engines agree bit-for-bit. Ties break to the SMALLER community
    * label; labeled nodes absent from the edge list are excluded
    * (degree comes from edges — the [[modularityByCommunity]]
    * convention).
    *
    * SYNCHRONOUS caveat (stated, not hidden): all nodes move
    * simultaneously — the standard distributed-Louvain compromise
    * (sequential moves are provably monotone in Q but serialize the
    * whole graph through one decision order). A synchronous sweep can
    * OSCILLATE — two adjacent nodes may swap into each other's
    * communities, and a sweep from singletons can lower Q — so the
    * operator's contract is REFINEMENT PROPOSAL, not guaranteed
    * ascent: from a near-converged assignment (LPA output, a previous
    * sweep's majority) a single mislabeled node moves home and Q
    * strictly improves (the spec pins exactly that), while from
    * singletons the sweep is the classic first-iteration shuffle whose
    * quality the [[modularityByCommunity]] readout (q313) adjudicates.
    * Alternate sweeps with LPA or re-score per sweep at scale.
    *
    * Overflow: 2m·k_i,in ≤ 4m² and k_i·Σtot ≤ 4m², so the scores ride
    * decimal(38,0) rails (the [[degreeAssortativity]] convention) —
    * inside 38 digits for m ≤ 1.5·10¹⁸ edges, i.e. no ceiling at any
    * physical graph size; the score is compare-only (argmax input,
    * never output), so the decimal lift changes no result bit.
    *
    * Shape: one neighbor-label join + (node, lab) rollup for k_i,in,
    * one community-sized Σtot rollup (broadcastable), one argmax via a
    * single struct-min aggregate — Pregel-shaped, no all-pairs
    * anything. */
  def modularityGainMove(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    val lab = PinnedCache.pin(labels.toDF("node", "lab"))
    val m = e.agg(count(lit(1)).as("m"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("ki"))
    val tot = deg.join(lab, "node")
      .groupBy(col("lab")).agg(sum(col("ki")).as("tot"))
    // k_i,in(c) for every neighboring community c of i
    val kin = sym
      .join(lab.select(col("node").as("b"), col("lab").as("c")), "b")
      .groupBy(col("a").as("node"), col("c")).agg(count(lit(1)).as("kin"))
    // the stay-put candidate: k_i,in(cur) if any neighbor shares the
    // label, else 0 — full-outer against kin restricted to c = cur
    val curCand = lab.select(col("node"), col("lab").as("c"))
      .join(kin, Seq("node", "c"), "left_outer")
      .select(col("node"), col("c"), coalesce(col("kin"), lit(0L)).as("kin"))
    val cands = kin.unionByName(curCand)
      .groupBy(col("node"), col("c")).agg(max(col("kin")).as("kin"))
    cands
      .join(lab.select(col("node"), col("lab").as("cur")), "node")
      .join(deg, "node")
      .join(tot.select(col("lab").as("c"), col("tot")), "c")
      .crossJoin(broadcast(m))
      .select(col("node"), col("c"),
        (lit(2L) * col("m").cast("decimal(38,0)") * col("kin") -
          col("ki").cast("decimal(38,0)") * (col("tot") -
            when(col("c") === col("cur"), col("ki")).otherwise(lit(0L))))
          .as("score"))
      .groupBy(col("node"))
      .agg(min(struct((-col("score")).as("ns"), col("c").as("c"))).as("s"))
      .select(col("node"), col("s.c").as("lab"))
  }

  /** Fixed-round STRONGLY connected components over a DIRECTED edge
    * list — the directed sibling the component tier was missing (CC
    * q44/q164 is undirected): the distributed COLORING algorithm
    * (FW-BW peeling, the standard Pregel-family SCC).
    * Per outer round, on the still-unassigned subgraph:
    *   1. TRIM: a node with in-degree 0 or out-degree 0 in the
    *      subgraph can sit in no cycle — assign it its own singleton
    *      SCC (the standard FW-BW trimming that eats the DAG-like
    *      periphery web graphs are mostly made of);
    *   2. forward MIN-label fixpoint f (innerRounds hops) on the
    *      non-trivial remainder: f(v) = the smallest id reaching v;
    *   3. roots r = {v : f(v) = v}; backward reach from each root
    *      along REVERSED edges restricted to its own color
    *      (settled/frontier split — only new nodes shuffle);
    *   4. every backward-reached v is provably in SCC(f(v)) — r
    *      reaches v (f(v) = r) and v reaches r through nodes of color
    *      r — so assign scc = f(v) and remove.
    * Colored-group removal is GATED on two closed-form convergence
    * predicates over the final state (no extra rounds needed):
    * forward converged ⟺ no edge (u,v) in the subgraph has
    * f(u) < f(v) (one more relax round would change nothing), and
    * backward converged ⟺ no unreached u has an edge into a reached
    * v of u's own color (the next frontier is empty). When BOTH hold,
    * each colored group is EXACTLY one true SCC (group ⊆ SCC(root) by
    * the color-restricted path argument; SCC(root) ⊆ group because at
    * the true fixpoint every member carries f = root — the root is the
    * SCC's minimum reaching member — and reaches the root within the
    * color). When either fails, NOTHING colored is removed that round:
    * an under-budgeted run can neither MERGE nor SPLIT a true SCC —
    * its members simply come back settled = false, scc = themselves
    * (trim removals stay sound at any budget: a trimmed node is
    * provably acyclic-positioned, and since every prior removal is a
    * complete SCC, in/out-degree 0 in the remaining subgraph certifies
    * a singleton). The oracle replays the identical schedule INCLUDING
    * the gate (the same two NOT EXISTS predicates). Completeness is
    * the fixed-iteration contract ([[kCorePeel]]/[[labelPropagation]]):
    * with innerRounds ≥ the reach diameter and outerRounds ≥ the peel
    * depth every node settles. Output: (node, scc, settled).
    *
    * Shape per inner round: one edges⋈frontier join + min rollup
    * (map-side combinable) — O(m) per round like [[integerPageRank]];
    * the subgraph restriction is two semi-joins per outer round; no
    * all-pairs anything. Early exits are 1-row driver checks (the
    * model-state pattern): outer rounds stop when everything settled
    * or no progress is possible; inner loops stop at the fixpoint /
    * empty frontier — a converged graph pays only the rounds it needs,
    * and the exits are result-invariant (skipped rounds would have
    * been no-ops), so the fixed-schedule oracle still matches. */
  def stronglyConnectedComponents(edges: DataFrame, outerRounds: Int,
      innerRounds: Int): DataFrame = {
    require(outerRounds >= 1 && outerRounds <= 5, "outerRounds in [1,5]")
    require(innerRounds >= 1 && innerRounds <= 10, "innerRounds in [1,10]")
    val e = PinnedCache.pin(edges.toDF("src", "dst")
      .where(col("src") =!= col("dst")).distinct())
    var unassigned = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val done = scala.collection.mutable.ArrayBuffer[DataFrame](
      // schema template so the final reduce is total even when the
      // loop exits immediately (empty edge input)
      unassigned.limit(0).select(col("node"), col("node").as("scc"),
        lit(true).as("settled")))
    var outer = 0
    var progress = true
    while (outer < outerRounds && progress && !unassigned.isEmpty) {
      outer += 1
      val sub0 = e
        .join(unassigned.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(unassigned.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")).localCheckpoint(true)
      // TRIM: in-degree-0 or out-degree-0 nodes are singleton SCCs
      val trivial = unassigned
        .join(sub0.select(col("dst").as("node")), Seq("node"), "left_anti")
        .unionByName(unassigned
          .join(sub0.select(col("src").as("node")), Seq("node"), "left_anti"))
        .distinct().localCheckpoint(true)
      done += trivial.select(col("node"), col("node").as("scc"),
        lit(true).as("settled"))
      unassigned = unassigned
        .join(trivial, Seq("node"), "left_anti").localCheckpoint(true)
      val sub = sub0
        .join(trivial.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(trivial.select(col("node").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst")).localCheckpoint(true)
      // forward min-label relaxation, fixpoint-exited (a chg marker
      // rides the already-checkpointed frame — no second join)
      var f = unassigned.select(col("node"), col("node").as("f"))
        .localCheckpoint(true)
      var fwdConverged = false
      var fr = 0
      while (fr < innerRounds && !fwdConverged) {
        fr += 1
        val prop = sub
          .join(f.select(col("node").as("src"), col("f")), "src")
          .groupBy(col("dst").as("node")).agg(min(col("f")).as("pf"))
        val f2 = f.join(prop, Seq("node"), "left_outer")
          .select(col("node"),
            least(col("f"), coalesce(col("pf"), col("f"))).as("f"),
            (coalesce(col("pf"), col("f")) < col("f")).as("chg"))
          .localCheckpoint(true)
        fwdConverged = f2.where(col("chg")).isEmpty
        f = f2.select(col("node"), col("f"))
      }
      if (!fwdConverged)
        // budget exhausted mid-change: the closed-form fixpoint test —
        // converged iff no edge could still lower its dst's label
        fwdConverged = sub
          .join(f.select(col("node").as("src"), col("f").as("fu")), "src")
          .join(f.select(col("node").as("dst"), col("f").as("fv")), "dst")
          .where(col("fu") < col("fv")).isEmpty
      var frontier = f.where(col("node") === col("f")).localCheckpoint(true)
      var reached = frontier
      var bwdConverged = false
      var br = 0
      def nextFrontier(): DataFrame = {
        val r0 = reached
        sub
          .join(frontier.select(col("node").as("dst"), col("f").as("bf")), "dst")
          .select(col("src").as("node"), col("bf")).distinct()
          .join(f, "node").where(col("f") === col("bf"))
          .select(col("node"), col("f"))
          .join(r0, Seq("node"), "left_anti")
          .localCheckpoint(true)
      }
      while (br < innerRounds && !bwdConverged) {
        br += 1
        frontier = nextFrontier()
        bwdConverged = frontier.isEmpty
        reached = reached.unionByName(frontier)
      }
      if (!bwdConverged)
        // every edge into an older frontier was already probed the round
        // after its head joined, so one more (empty) frontier from the
        // LAST one is exactly the full no-unreached-candidate predicate
        bwdConverged = nextFrontier().isEmpty
      if (fwdConverged && bwdConverged) {
        done += reached.select(col("node"), col("f").as("scc"),
          lit(true).as("settled"))
        unassigned = unassigned
          .join(reached.select(col("node")), Seq("node"), "left_anti")
          .localCheckpoint(true)
        progress = true
      } else {
        // nothing colored may settle; without trim progress the next
        // round would replay this one verbatim — stop (result-equal:
        // the oracle's remaining fixed rounds are no-ops there too)
        progress = !trivial.isEmpty
      }
    }
    done.reduce(_ unionByName _)
      .unionByName(unassigned.select(col("node"), col("node").as("scc"),
        lit(false).as("settled")))
  }

  /** DEGREE ASSORTATIVITY in exact integer ppm — the one-row graph-
    * health readout next to [[distanceHistogram]] and q221 reciprocity:
    * the Pearson correlation between the endpoint degrees of an edge
    * (positive = hubs link hubs, social-graph-like; negative = hubs
    * link leaves, web/biology-like — THE structural signal for whether
    * a link graph's hubs are a community or a broadcast layer).
    *
    * Exactness: over the SYMMETRIZED edge list the two endpoint-degree
    * marginals are IDENTICAL, so σx = σy and
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
    * is an exact RATIONAL — no square root at all (the usual Pearson
    * sqrt only appears when the marginals differ). One floor division
    * with the +10⁶·denominator shift (|r| ≤ 1 keeps the shifted
    * dividend non-negative, where Spark trunc ≡ DuckDB floor — the
    * [[modularityByCommunity]] shift discipline); all products ride
    * decimal(38,0) rails (the withZ2Ppm convention) so no overflow at
    * any graph size. A degree-regular graph (zero variance) raises
    * loudly — r is undefined there, and a silent NULL would read as a
    * verdict. Output: (n_sym_edges, r_ppm). */
  def degreeAssortativity(edges: DataFrame): DataFrame =
    assortativityReadout(degreeAssortativityStats(edges))

  /** The four exact sufficient statistics behind [[degreeAssortativity]]
    * — (m = Σ_v deg(v) = |sym edges|, sx = Σ_v deg², sxx = Σ_v deg³,
    * sxy = Σ_sym deg(a)·deg(b)), all on decimal(38,0) rails. This IS
    * the maintainable model state: [[incrementalAssortativity]] updates
    * these four scalars under an edge wave without re-reading the
    * graph-sized joins. */
  def degreeAssortativityStats(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = sym.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("n").as("a"), col("deg").as("dx")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("dy")), "b")
      .agg(count(lit(1)).as("m"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"))
  }

  /** Shared readout (m, sx, sxx, sxy) → (n_sym_edges, r_ppm): the one
    * shifted floor division of the [[degreeAssortativity]] doc. */
  private def assortativityReadout(stats: DataFrame): DataFrame = stats
    .select(col("m").as("n_sym_edges"),
      expr("""case when m * sxx - sx * sx = 0 then
              |  cast(raise_error('degreeAssortativity: degree-regular graph — r undefined (zero variance)') as bigint)
              |else cast((1000000 * (m * sxy - sx * sx)
              |     + 1000000 * (m * sxx - sx * sx)) div (m * sxx - sx * sx)
              |     - 1000000 as bigint) end""".stripMargin).as("r_ppm"))

  /** INCREMENTAL [[degreeAssortativity]] — the FIFTEENTH maintained
    * form, and the family's only SCALAR one: the state is the four
    * sufficient statistics of [[degreeAssortativityStats]], and the
    * node sums update CLOSED-FORM from touched-degree changes alone —
    * m = Σ deg, sx = Σ deg², sxx = Σ deg³ move only where a degree
    * moves (the delta's endpoints), and the edge sum
    * sxy = Σ_sym deg(a)·deg(b) moves only on edges INCIDENT to a
    * touched endpoint (both old and new degrees of the 1-ball are two
    * cheap scans of base against the broadcast touched set) plus the
    * new edges' own terms. The r13 shuffle discipline throughout: base
    * is scanned, never exchanged; every derived frame is ball-sized
    * and hint-gated; the delta is deduped against base via the
    * scan-side overlap probe. CONTRACT: base is canonical (distinct,
    * one orientation, no self-loops — the [[conductanceByCommunity]]
    * convention); delta may overlap base (deduped here). Output ≡
    * [[degreeAssortativity]] on base ∪ delta (the oracle proves it). */
  def incrementalAssortativity(prevStats: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame): DataFrame =
    assortativityReadout(
      incrementalAssortativityStats(prevStats, baseEdges, deltaEdges))

  /** The stats-level half of [[incrementalAssortativity]]: returns the
    * UPDATED four sufficient statistics (m, sx, sxx, sxy) so a caller
    * can THREAD them across delta waves (the GraphIvmStreamSpec
    * foreachBatch loop) instead of re-deriving base stats per wave. */
  def incrementalAssortativityStats(prevStats: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame): DataFrame = {
    // key-type-agnostic (the batch stats op takes string hosts too):
    // every use is a join/count, never arithmetic on the node ids
    def norm(df: DataFrame) = df.toDF("a", "b")
    // base is SCANNED repeatedly (the gate count + semi-joins) — the
    // caller pins it (every query/spec does); an internal checkpoint
    // here double-materialized it, measured +2 s on q318's fixture
    val base = norm(baseEdges)
    // size-gated hints (the [[frontierHinter]] trade), decided on base
    val mh = frontierHinter(base)
    val delta0 = mh(norm(deltaEdges).distinct().localCheckpoint(true))
    val overlap = mh(base.join(delta0, Seq("a", "b"), "left_semi")
      .localCheckpoint(true))
    val dEff = mh(delta0.join(overlap, Seq("a", "b"), "left_anti")
      .localCheckpoint(true))
    val touched = mh(dEff.select(col("a").as("node"))
      .unionByName(dEff.select(col("b").as("node"))).distinct()
      .localCheckpoint(true))
    // base edges whose deg(a)·deg(b) term moves (>= 1 touched endpoint)
    val incident = mh(base
      .join(touched.select(col("node").as("a")), Seq("a"), "left_semi")
      .unionByName(base
        .join(touched.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      .distinct().localCheckpoint(true))
    val ball = mh(incident.select(col("a").as("node"))
      .unionByName(incident.select(col("b").as("node")))
      .unionByName(touched.select(col("node")))
      .distinct().localCheckpoint(true))
    // old degrees of ball nodes: two scans of base; new nodes get 0
    val degOld = base
      .join(ball.select(col("node").as("a")), Seq("a"), "left_semi")
      .select(col("a").as("node"))
      .unionByName(base
        .join(ball.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d0"))
    val dDelta = dEff.select(col("a").as("node"))
      .unionByName(dEff.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dd"))
    val degs = mh(degOld.join(dDelta, Seq("node"), "full")
      .select(col("node"), coalesce(col("d0"), lit(0L)).as("d0"),
        (coalesce(col("d0"), lit(0L)) + coalesce(col("dd"), lit(0L))).as("d1"))
      .localCheckpoint(true))
    val nodeDelta = degs.join(touched, Seq("node"), "left_semi")
      .agg(coalesce(sum(col("d1") - col("d0")), lit(0L)).as("dm"),
        coalesce(sum(col("d1").cast("decimal(38,0)") * col("d1")
          - col("d0").cast("decimal(38,0)") * col("d0")),
          lit(0L).cast("decimal(38,0)")).as("dsx"),
        coalesce(sum(col("d1").cast("decimal(38,0)") * col("d1") * col("d1")
          - col("d0").cast("decimal(38,0)") * col("d0") * col("d0")),
          lit(0L).cast("decimal(38,0)")).as("dsxx"))
    val incTerm = incident
      .join(degs.select(col("node").as("a"), col("d0").as("a0"),
        col("d1").as("a1")), "a")
      .join(degs.select(col("node").as("b"), col("d0").as("b0"),
        col("d1").as("b1")), "b")
      .agg(coalesce(sum(col("a1").cast("decimal(38,0)") * col("b1")
        - col("a0").cast("decimal(38,0)") * col("b0")),
        lit(0L).cast("decimal(38,0)")).as("ti"))
    val newTerm = dEff
      .join(degs.select(col("node").as("a"), col("d1").as("a1")), "a")
      .join(degs.select(col("node").as("b"), col("d1").as("b1")), "b")
      .agg(coalesce(sum(col("a1").cast("decimal(38,0)") * col("b1")),
        lit(0L).cast("decimal(38,0)")).as("tn"))
    prevStats.toDF("m", "sx", "sxx", "sxy")
      .crossJoin(broadcast(nodeDelta))
      .crossJoin(broadcast(incTerm))
      .crossJoin(broadcast(newTerm))
      .select((col("m") + col("dm")).as("m"),
        (col("sx") + col("dsx")).cast("decimal(38,0)").as("sx"),
        (col("sxx") + col("dsxx")).cast("decimal(38,0)").as("sxx"),
        (col("sxy") + lit(2) * (col("ti") + col("tn")))
          .cast("decimal(38,0)").as("sxy"))
  }

  /** AVERAGE NEIGHBOR DEGREE per degree class — the assortativity
    * SPECTRUM (Pastor-Satorras k_nn(k)) complementing
    * [[degreeAssortativity]]'s one number: for each degree k, the mean
    * degree of the neighbors of degree-k nodes, in exact integer ppm
    * of a degree unit (one floor per class, decimal(38,0) rails —
    * Σ_nbr deg over a class ≤ m·maxdeg stays inside 38 digits
    * anywhere). Rising curve = assortative mixing, falling =
    * hubs-feed-leaves; WHERE it bends is what the scalar r hides.
    * Input: canonical undirected edges. Output: (deg, n_nodes,
    * knn_ppm) — knn_ppm = 10⁶·(mean neighbor degree). Shape: one
    * degree rollup + one sym⋈deg⋈deg join + a (deg)-keyed rollup —
    * all partial-agg friendly, output is degree-spectrum sized. */
  def avgNeighborDegree(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = PinnedCache.pin(
      sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg")))
    sym
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .groupBy(col("da").as("deg"))
      .agg(countDistinct(col("a")).as("n_nodes"),
        sum(col("db").cast("decimal(38,0)")).as("snd"),
        count(lit(1)).as("n_ends"))
      .select(col("deg"), col("n_nodes"),
        expr("(snd * 1000000) div n_ends").as("knn_ppm"))
  }

  /** Link-prediction scores for every NON-adjacent pair at distance 2 —
    * the candidate-edge table a recommender or knowledge-graph
    * completion pass ranks: cn = |N(u) ∩ N(v)| (common neighbors) and
    * the Resource-Allocation index Σ_z 10⁶ div deg(z) over the shared
    * neighbors z (Zhou-Lü-Zhang 2009 — RA beats Adamic-Adar's 1/log
    * AND stays integer-exact: one floor per shared neighbor, summed —
    * engine-portable, no transcendental). Input: CANONICAL undirected
    * edges (a < b, distinct). Output: (u, v, cn, ra_ppm) with u < v,
    * only pairs with >= 1 shared neighbor and no existing edge.
    *
    * Shape: one wedge self-join through the shared neighbor (the
    * [[triangleCounts]] wedge volume, O(Σ deg²) candidates — cap hubs
    * with [[capAdjacency]] first on skewed graphs; the standard
    * link-prediction practice), one anti-join against the edge list,
    * one (u, v) rollup. Wedge centers have deg >= 2 by construction,
    * so the RA division never sees zero. */
  def linkPredictionScores(edges: DataFrame): DataFrame = {
    val e = PinnedCache.pin(edges.toDF("a", "b"))
    val sym = PinnedCache.pin(
      e.unionByName(e.select(col("b").as("a"), col("a").as("b"))))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val wedges = sym.as("x").join(sym.as("y"),
        col("x.b") === col("y.a") && col("x.a") < col("y.b"))
      .select(col("x.a").as("u"), col("y.b").as("v"), col("x.b").as("z"))
    wedges
      .join(e.select(col("a").as("u"), col("b").as("v")), Seq("u", "v"),
        "left_anti")
      .join(deg.select(col("node").as("z"), col("deg")), "z")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000L div deg")).as("ra_ppm"))
  }

  /** RICH-CLUB coefficients φ(k) = (2·E_k·10⁶) div (N_k·(N_k−1)) for a
    * ladder of degree thresholds k — the hub-interconnection readout
    * next to [[degreeAssortativity]] (assortativity is the one-number
    * correlation; the rich-club curve says WHERE on the degree spectrum
    * hubs close ranks): N_k = nodes with deg > k, E_k = edges with both
    * endpoints in that club. Exact integer ppm on decimal(38,0) rails;
    * thresholds whose club has < 2 members are OMITTED (φ undefined —
    * an absent row is honest where a NULL would read as a value).
    * Input: canonical undirected edges. Shape per k: two broadcast-able
    * semi-joins + one count — the ladder shares one degree rollup. */
  def richClub(edges: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.forall(_ >= 1),
      "ks ascending, >= 1")
    val e = PinnedCache.pin(edges.toDF("a", "b"))
    val deg = PinnedCache.pin(e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    ks.map { k =>
      val club = deg.where(col("deg") > k.toLong).select(col("node"))
      val ek = e
        .join(club.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(club.select(col("node").as("b")), Seq("b"), "left_semi")
      club.agg(count(lit(1)).as("n_club"))
        .crossJoin(broadcast(ek.agg(count(lit(1)).as("e_club"))))
        .select(lit(k.toLong).as("k"), col("n_club"), col("e_club"),
          expr("""(2 * cast(e_club as decimal(38,0)) * 1000000)
                 |div (cast(n_club as decimal(38,0)) * (n_club - 1))"""
            .stripMargin).as("phi_ppm"))
        .where(col("n_club") >= 2L)
    }.reduce(_ unionByName _)
  }

  /** RAND INDEX between two label assignments of the SAME node set —
    * the partition-agreement readout for clustering stability (is the
    * LPA assignment at rounds+1 the same mesoscale structure, or did
    * the communities churn? are the dedup clusters stable across a
    * threshold bump?): RI = (agreeing pairs) / C(n,2), where a pair
    * agrees when both assignments put it together or both apart. Exact
    * via the contingency identity in DOUBLED pair units (x·(x−1) =
    * 2·C(x,2) keeps everything integral):
    *   agree2 = n(n−1) − Σ_i a_i(a_i−1) − Σ_j b_j(b_j−1) + 2·Σ_ij n_ij(n_ij−1)
    * with one floor division, decimal(38,0) rails. Node sets must
    * match EXACTLY — raised loudly (a silent inner join would score
    * only the intersection and read as a verdict). Shape: one join on
    * node, one contingency rollup + two marginal rollups — contingency-
    * sized state, no pair enumeration anywhere. */
  def randIndex(labelsA: DataFrame, labelsB: DataFrame): DataFrame = {
    val a = labelsA.toDF("node", "la").localCheckpoint(true)
    val b = labelsB.toDF("node", "lb").localCheckpoint(true)
    val j = a.join(b, "node").localCheckpoint(true)
    val (na, nb, n) = (a.count(), b.count(), j.count())
    require(na == n && nb == n,
      s"randIndex: node sets differ (|A| = $na, |B| = $nb, |A ∩ B| = $n)")
    require(n >= 2, s"randIndex: n = $n < 2 — no pairs to score")
    val cont = j.groupBy(col("la"), col("lb")).agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val s11 = cont.agg(coalesce(sum(col("nij").cast("decimal(38,0)")
      * (col("nij") - 1)), lit(0L).cast("decimal(38,0)")).as("s11_2"))
    val sa = cont.groupBy(col("la")).agg(sum(col("nij")).as("ai"))
      .agg(coalesce(sum(col("ai").cast("decimal(38,0)") * (col("ai") - 1)),
        lit(0L).cast("decimal(38,0)")).as("sa_2"))
    val sb = cont.groupBy(col("lb")).agg(sum(col("nij")).as("bj"))
      .agg(coalesce(sum(col("bj").cast("decimal(38,0)") * (col("bj") - 1)),
        lit(0L).cast("decimal(38,0)")).as("sb_2"))
    s11.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .select(lit(n).as("n_nodes"),
        expr(s"""((cast($n as decimal(38,0)) * ${n - 1} - sa_2 - sb_2
                 | + 2 * s11_2) * 1000000)
                 |div (cast($n as decimal(38,0)) * ${n - 1})""".stripMargin)
          .as("ri_ppm"))
  }

  /** Portable 60-bit hash driving walk-step choices — delegates to
    * [[Sampling.portableHash]] (ONE copy of the engine-portability-
    * critical recipe; the extra string cast is a no-op on these keys). */
  private def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Sampling.portableHash(c)

  /** Broadcast-hint an already-materialized model-state frame when it is
    * ACTUALLY small. `localCheckpoint` erases precise stats (the
    * LogicalRDD reports the default size), so without the hint Spark
    * plans SortMergeJoin and PAYS the big side's exchange before AQE's
    * runtime conversion can see the real size — measured 2× the full
    * recompute's shuffle on incrementalKatz at 1M edges
    * (MaintenanceCostSpec). The count is a cheap action over
    * already-materialized partitions; above the threshold the frame is
    * returned unhinted — ball-sized state IS graph-sized on an expander,
    * and force-broadcasting what might not fit trades a shuffle for an
    * OOM. The gate is rows AND estimated bytes (rows × Σ field
    * defaultSize, ADVICE r13): a near-threshold WIDE frame — e.g. a
    * labeledBfs (seed, node, d) ball at 2M rows — estimates tens of MB
    * and must not be force-broadcast under the repo's 2 GB-driver
    * stress profile just because its row count squeaked under the cap. */
  private[graft] def hintIfSmall(df: DataFrame,
      maxRows: Long = 2000000L, maxBytes: Long = 48L << 20): DataFrame = {
    val rowBytes = df.schema.map(_.dataType.defaultSize.toLong).sum.max(1L)
    val n = df.count()
    if (n <= maxRows && n * rowBytes <= maxBytes) broadcast(df) else df
  }

  /** ONE gating decision per operator call for the frontier/ball hints:
    * each [[hintIfSmall]] costs a count JOB per round (~50 ms of
    * scheduling), which only amortizes when the scanned side is big
    * enough that the exchange it avoids dominates — measured +1.4 s on
    * q312's ~8k-edge host graph (24 pointless count jobs) vs a 122 →
    * 0.1 MB shuffle cut on the 1M-edge ring forest. Below the threshold
    * the un-hinted plan's exchanges are a few MB and CHEAPER than the
    * jobs; above it the jobs are noise against the scans. The count
    * itself runs once per call on an already-pinned/checkpointed frame. */
  private def frontierHinter(big: DataFrame): DataFrame => DataFrame =
    if (big.count() > 500000L) hintIfSmall(_) else identity

  /** Pin an edge frame for a per-round JOIN LADDER and decide the
    * frontier-hint policy in the same size gate (guide §2.4 "two
    * operations keyed the same way can share one exchange"):
    *
    *  - SMALL graphs (≤ the [[frontierHinter]] gate): hash-partition the
    *    frame by `key` ONCE before the pin, so every round's
    *    edges ⋈ frontier join reuses that partitioning instead of
    *    re-exchanging the static edge frame per round — the
    *    labelPropagation idiom (r14 change 4; a cached frame's
    *    outputPartitioning survives InMemoryTableScan). No hints: below
    *    the gate the hint's per-round count jobs cost more than the
    *    KB-size exchanges they would avoid (measured, frontierHinter
    *    doc).
    *  - BIG graphs: the per-round joins broadcast the frontier instead
    *    (the returned hinter), so the edge side is never exchanged at
    *    all and an upfront repartition would be a pure extra full-graph
    *    exchange — skipped.
    *
    * Returns (pinned edge frame, frontier hinter). Results are
    * partitioning-independent; only the plan changes. */
  private def pinLadderEdges(e: DataFrame, key: String)
      : (DataFrame, DataFrame => DataFrame) = {
    val raw = PinnedCache.pin(e)
    val n = raw.count()
    // LOW gate (measured, r15 subset A/B): ball-probe ladders over TINY
    // graphs (the incremental forms' ≤few-k-edge balls — katz/truss/
    // betweenness maintenance) lost 20–30% to the repartition + second
    // cache materialization, because their per-round joins broadcast the
    // sub-64m edge side anyway; below the gate the r13 plain-pin plan is
    // kept byte-identical. Between the gates the pre-partition wins
    // (q187/q220/q307/q309: 1.16–1.40× same-window).
    if (n > 500000L) (raw, hintIfSmall(_))
    else if (n < 32768L) (raw, identity)
    else (PinnedCache.pin(raw.repartition(col(key))), identity)
  }

  /** Deterministic ADJACENCY CAP — the hub pre-step for the walk tier:
    * [[node2vecWalks]]'s second-order fan-out is |frontier|·deg(cur),
    * so one 10⁷-degree hub makes that key's candidate list the
    * straggler at ANY partitioning (the SkewRehearsalSpec finding;
    * [[randomWalks]] itself is structurally immune after the
    * composite-key reshape). Keeps, per src, the `maxDeg` neighbors
    * ranked smallest by (portableHash(src:dst), dst) — a pure function
    * of the edge: no RNG, engine-portable ([[Sampling.portableHash]],
    * replayed in DuckDB as the md5-prefix cast), stable under
    * partitioning, and independent across sources (adding edges at
    * OTHER sources never changes a hub's kept set). On a graph whose
    * max degree is already ≤ maxDeg the output IS the input edge set —
    * the cap is an OPT-IN pre-step; walk operators stay exact when it
    * is off, and under the cap they run on the capped graph exactly
    * (determinism contract unchanged — the capped graph is itself
    * deterministic). Shape: distinct + ONE src-keyed window (the same
    * shuffle the walk adjacency index pays anyway); output (src, dst). */
  def capAdjacency(edges: DataFrame, maxDeg: Int): DataFrame = {
    require(maxDeg >= 1, "maxDeg >= 1")
    import org.apache.spark.sql.expressions.Window
    val rank = Sampling.portableHash(concat(col("src").cast("string"),
      lit(":"), col("dst").cast("string")))
    val w = Window.partitionBy(col("src")).orderBy(rank, col("dst"))
    edges.toDF("src", "dst").distinct()
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= maxDeg)
      .select(col("src"), col("dst"))
  }

  /** DETERMINISTIC random-walk corpus (the DeepWalk/node2vec
    * training-data generator): `walksPerNode` walks of `steps` hops from
    * each origin, where hop `s` of walk `w` at node `cur` moves to the
    * neighbor whose rank (by dst order) equals
    *   hash60(origin:w:s:cur) mod deg(cur)
    * — a pure hash function of the walk coordinate, so the corpus is
    * bit-identical across engines, runs, and partitionings (no RNG
    * state; the house seeded-fixture discipline applied to sampling a
    * TRAJECTORY instead of a row set). Returns (origin, walk, step,
    * node) including step 0 = the origin itself; a walk that reaches a
    * node with no outgoing edges TERMINATES (its later steps are simply
    * absent — the join drops them; on a symmetrized graph every reached
    * node has deg ≥ 1 and all walks run full length).
    *
    * Shape: the adjacency index (src, dst, idx, deg) is built once
    * (one window over the edge list) and eagerly checkpointed; each hop
    * is TWO equi-joins — frontier → (src, deg) degree table (node-keyed,
    * |walks| rows out) to compute the chosen rank `ridx = hash60 mod
    * deg` ON the frontier, then frontier → adjacency on the composite
    * key (cur, ridx) = (src, idx). Because ridx is a frontier-side
    * column, BOTH conditions are extractable equi-keys: the hop probe
    * carries |walks| rows, never the Σ deg(cur) residual-filter fan-out
    * a deg-on-the-build-side predicate would force. Embarrassingly
    * parallel over walks; neighbor lists are never materialized. */
  def randomWalks(edges: DataFrame, origins: DataFrame, walksPerNode: Int,
      steps: Int): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 64, "walksPerNode in [1,64]")
    require(steps >= 1 && steps <= 20, "steps in [1,20]")
    import org.apache.spark.sql.expressions.Window
    val wAdj = Window.partitionBy(col("src")).orderBy(col("dst"))
    // distinct FIRST: a duplicate (src, dst) row would inflate deg and
    // give that neighbor two idx slots — silently diverging from the
    // hash-mod-degree-over-distinct-neighbors contract
    val adj = edges.toDF("src", "dst").distinct()
      .select(col("src"), col("dst"),
        (row_number().over(wAdj) - 1).cast("long").as("idx"),
        count(lit(1)).over(Window.partitionBy(col("src"))).as("deg"))
      .localCheckpoint(true)
    val degT = adj.select(col("src").as("d_src"), col("deg")).distinct()
      .localCheckpoint(true)
    // distinct origins: a duplicated origin row would emit duplicate
    // (origin, walk) state rows and duplicate corpus rows
    var state = origins.toDF("origin").distinct()
      .select(col("origin"),
        explode(array((0 until walksPerNode).map(w => lit(w.toLong)): _*)).as("walk"))
      .withColumn("cur", col("origin"))
      .localCheckpoint(true)
    var out = state.select(col("origin"), col("walk"),
      lit(0L).as("step"), col("cur").as("node"))
    for (s <- 1 to steps) {
      state = walkHop(state, degT, adj, s).localCheckpoint(true)
      out = out.unionByName(state.select(col("origin"), col("walk"),
        lit(s.toLong).as("step"), col("cur").as("node")))
    }
    out
  }

  /** INCREMENTAL [[randomWalks]] — the walk-CORPUS maintained form
    * (the q304/q311/q324 discipline applied to a training-data
    * PRODUCT, not a statistic): given the stored corpus for the base
    * graph and an additive `deltaEdges` wave, produce the corpus
    * IDENTICAL to re-running [[randomWalks]] over base ∪ delta.
    *
    * Exactness argument: a hop from `cur` reads ONLY cur's out-
    * adjacency (the sorted distinct dst list and its size feed the
    * hash-mod-degree pick), and adjacency changes only for the SRC
    * endpoints of delta edges — so a walk whose trajectory never
    * stands on a delta src at any step it hops from (step < steps,
    * including a sink-terminated walk's last stand) makes bit-identical
    * choices on the union graph and its stored rows pass through
    * VERBATIM. Walks that do touch a delta src are re-walked on the
    * union graph. Granularity is the ORIGIN (all its walks re-walk
    * together): an untouched walk of a touched origin recomputes to
    * exactly its stored rows (hash choices are per-(origin, walk)
    * coordinate, independent across walks), so origin-keyed maintenance
    * is still bit-exact while keeping the replay one [[randomWalks]]
    * call.
    *
    * Scale shape: touched detection is one corpus⋈delta-srcs semi-join
    * (corpus scanned once, never rewritten); the replay costs
    * |touched origins| · walks · steps — cost ∝ the touched region.
    * Requires base ∩ delta = ∅ and the same (walksPerNode, steps). */
  def incrementalRandomWalks(prevCorpus: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, walksPerNode: Int, steps: Int): DataFrame = {
    val corpus = PinnedCache.pin(
      prevCorpus.toDF("origin", "walk", "step", "node"))
    val dE = PinnedCache.pin(deltaEdges.toDF("src", "dst").distinct())
    val all = baseEdges.toDF("src", "dst").unionByName(dE)
    // a walk is touched iff it STANDS ON a delta src at a step it hops
    // from — i.e. any step < steps (a full-length walk's last row only
    // receives; a truncated walk's last row was a sink, and a delta
    // edge out of it un-sinks the walk, so it counts — which it does:
    // its step is < steps exactly because the walk terminated early)
    val touchedOrigins = corpus
      .where(col("step") < steps.toLong)
      .join(dE.select(col("src").as("node")), Seq("node"), "left_semi")
      .select(col("origin")).distinct()
    val replayed = randomWalks(all, touchedOrigins, walksPerNode, steps)
    corpus
      .join(touchedOrigins, Seq("origin"), "left_anti")
      .select(col("origin"), col("walk"), col("step"), col("node"))
      .unionByName(replayed)
  }

  /** One [[randomWalks]] hop, uncheckpointed — package-visible so the
    * plan spec can pin the two-equi-join shape (degree join → ridx on
    * the frontier → composite-key adjacency join, NO pmod residual in
    * any join condition — the O(|walks|) contract). */
  private[ext] def walkHop(state: DataFrame, degT: DataFrame,
      adj: DataFrame, s: Int): DataFrame = {
    val key = concat(col("origin"), lit(":"), col("walk").cast("string"),
      lit(":"), lit(s.toString), lit(":"), col("cur"))
    state
      .join(degT, col("cur") === col("d_src"))
      .withColumn("ridx", hash60(key) % col("deg"))
      .join(adj, col("cur") === col("src") && col("ridx") === col("idx"))
      .select(col("origin"), col("walk"), col("dst").as("cur"))
  }

  /** DETERMINISTIC node2vec walks (Grover & Leskovec 2016) — the
    * SECOND-ORDER biased sibling of [[randomWalks]]: from `cur` with
    * predecessor `prev`, each neighbor is weighted `retW` if it IS prev
    * (the return bias, 1/p·1000), `comW` if it is also a neighbor of
    * prev (distance-1 from prev — BFS-ish), else `outW` (distance-2 —
    * DFS-ish, 1/q·1000); the hop lands where
    *   hash60(origin:walk:step:cur) mod Σweights
    * falls in the neighbor's cumulative-weight slot (neighbors in dst
    * order). Step 1 has no predecessor and is uniform (all weights
    * equal). Same determinism contract as [[randomWalks]]: a pure hash
    * of the walk coordinate — no RNG state, bit-identical across
    * engines/partitionings, sink walks terminate. Edges must be
    * DISTINCT (duplicate adjacency rows would double weight slots).
    *
    * Shape: per hop, the walk frontier joins the edge list once for the
    * neighbor fan-out, once (left) against it for the prev-adjacency
    * test, then a (origin, walk)-keyed cumulative window picks ONE slot
    * — |frontier|·deg(cur) candidate rows per hop, the unavoidable
    * second-order footprint; the edge list itself never re-shuffles
    * (checkpointed once). Weights are int milli-units: Σ ≤ deg·1000,
    * no overflow anywhere near 2^63. */
  def node2vecWalks(edges: DataFrame, origins: DataFrame, walksPerNode: Int,
      steps: Int, retW: Int, comW: Int, outW: Int): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 64, "walksPerNode in [1,64]")
    require(steps >= 1 && steps <= 20, "steps in [1,20]")
    require(retW >= 1 && comW >= 1 && outW >= 1, "weights are positive ints")
    import org.apache.spark.sql.expressions.Window
    // distinct enforced (not just documented): duplicate adjacency rows
    // would double that neighbor's weight slot
    val e = edges.toDF("src", "dst").distinct().localCheckpoint(true)
    val wCum = Window.partitionBy(col("origin"), col("walk")).orderBy(col("dst"))
    val wTot = Window.partitionBy(col("origin"), col("walk"))
    def pick(cands: DataFrame, step: Int): DataFrame = {
      val key = concat(col("origin"), lit(":"), col("walk").cast("string"),
        lit(":"), lit(step.toString), lit(":"), col("cur"))
      cands
        .withColumn("cum", sum(col("wt")).over(wCum))
        .withColumn("tot", sum(col("wt")).over(wTot))
        .withColumn("r", hash60(key) % col("tot"))
        .where(col("r") >= col("cum") - col("wt") && col("r") < col("cum"))
        .select(col("origin"), col("walk"), col("cur").as("prev"),
          col("dst").as("cur"))
    }
    // distinct origins: a duplicated origin row would create duplicate
    // (origin, walk) state rows, and the (origin, walk)-keyed cumulative
    // window would then double-count tied dst candidates (tot doubled,
    // overlapping slots) — walks silently vanish or fork
    var state = origins.toDF("origin").distinct()
      .select(col("origin"),
        explode(array((0 until walksPerNode).map(w => lit(w.toLong)): _*)).as("walk"))
      .withColumn("prev", col("origin")).withColumn("cur", col("origin"))
      .localCheckpoint(true)
    var out = state.select(col("origin"), col("walk"),
      lit(0L).as("step"), col("cur").as("node"))
    for (s <- 1 to steps) {
      val fan = state.join(e, col("cur") === col("src"))
      val cands =
        if (s == 1) fan.withColumn("wt", lit(1L))
        else fan
          .join(e.select(col("src").as("c_src"), col("dst").as("c_dst")),
            col("prev") === col("c_src") && col("dst") === col("c_dst"), "left")
          .withColumn("wt",
            when(col("dst") === col("prev"), retW.toLong)
              .when(col("c_src").isNotNull, comW.toLong)
              .otherwise(outW.toLong))
      state = pick(cands, s).localCheckpoint(true)
      out = out.unionByName(state.select(col("origin"), col("walk"),
        lit(s.toLong).as("step"), col("cur").as("node")))
    }
    out
  }

  /** SKIP-GRAM (center, context) pair counts from a walk corpus — the
    * word2vec-style training table that [[randomWalks]]/[[node2vecWalks]]
    * corpora exist to feed (DeepWalk trains skip-gram ON the walks; this
    * is that materialization as data): for every walk, every ordered
    * node pair within `window` steps of each other (either direction,
    * excluding distance 0) contributes one observation; output is
    * (center, context, cnt). Deterministic — a pure function of the
    * (already deterministic) corpus.
    *
    * Shape: the corpus explodes into 2·window offset probes (cheap —
    * corpus rows × 2w) and ONE equi-join back to itself on the exact
    * (origin, walk, step) key — no range residual, no per-walk
    * collect_list; then one map-side-combinable count. Walks that
    * terminated early (sinks) contribute only their existing steps —
    * the join drops the rest, same as the corpus itself. */
  def skipGramPairs(corpus: DataFrame, window: Int): DataFrame = {
    require(window >= 1 && window <= 10, "window in [1,10]")
    val c = PinnedCache.pin(corpus.toDF("origin", "walk", "step", "node"))
    val offsets = (-window to window).filter(_ != 0)
    c.select(col("origin"), col("walk"), col("node").as("center"),
        col("step"),
        explode(array(offsets.map(o => lit(o.toLong)): _*)).as("off"))
      .select(col("origin"), col("walk"), col("center"),
        (col("step") + col("off")).as("step"))
      .join(c.select(col("origin"), col("walk"), col("step"),
        col("node").as("context")), Seq("origin", "walk", "step"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fixed-round k-TRUSS peel over an undirected edge list `(a, b)` —
    * the EDGE-level cohesion tier completing the node-level
    * [[kCorePeel]] and the per-node [[triangleCounts]]: each round
    * computes every surviving edge's SUPPORT (the number of triangles
    * through it = common neighbors of its endpoints) and drops edges
    * with support < k−2; `rounds` fixed synchronous rounds (the
    * [[kCorePeel]] fixed-iteration contract — run to the graph's truss
    * peel depth for the converged k-truss; the readout reports support
    * recomputed on the FINAL surviving subgraph, which after an
    * unconverged last peel may be below k−2 for some edges, exactly as
    * [[kCorePeel]]'s degrees may be). Output: (a, b, support) with
    * a < b canonical.
    *
    * Shape per round: support is counted from each edge's
    * LOWER-DEGREE endpoint — one wedge join fanning Σ_e min(deg(a),
    * deg(b)) candidate rows (the O(α·m) arboricity bound, the same
    * orientation discipline as [[triangleCounts]]) closed by one
    * edge-keyed semi-join; never Σ deg and never all-pairs. The peel
    * itself is one support filter + semi-join. Overflow-free: supports
    * and degrees are counts ≤ m. */
  def kTrussEdges(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kTrussEdgesFromTrace(kTrussTrace(edges, k, rounds), rounds)

  /** [[kTrussEdges]]'s final (a, b, support) readout off an
    * ALREADY-COMPUTED [[kTrussTrace]] — so a maintenance pipeline that
    * stores both the trajectory and the final readout (q329's shape)
    * runs the batch peel ONCE and derives both, instead of paying two
    * full peels for identical state (guide §2.4 — the computation is
    * deterministic, so trace-then-readout ≡ recompute bit-for-bit).
    * The surviving-round slice is checkpointed before the support
    * probe, which scans it three ways (targets + both sym orientations)
    * and would otherwise re-scan the whole unioned trace each time. */
  def kTrussEdgesFromTrace(trace: DataFrame, rounds: Int): DataFrame = {
    val fin = trace.toDF("round", "a", "b")
      .where(col("round") === rounds.toLong)
      .select(col("a"), col("b")).localCheckpoint(true)
    fin.join(edgeSupport(fin, fin), Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Canonical (a < b, no loops, distinct) form of an edge frame. */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges.toDF("a", "b")
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()

  /** Triangle SUPPORT of every `targets` edge counted within the
    * `context` graph (both canonical (a, b) frames; targets ⊆ context
    * for the truss semantics): wedges probe from each target edge's
    * LOWER-degree endpoint — Σ min(deg a, deg b) candidate rows, the
    * arboricity bound — closed by one edge-keyed semi-join against the
    * context. Shared by [[kTrussTrace]] (targets = context = the
    * survivors) and [[incrementalKTrussTrace]] (targets = the affected
    * ball, context = ball survivors ∪ stored out-of-ball rows). */
  private def edgeSupport(targets: DataFrame, context: DataFrame): DataFrame = {
    val sym = context.unionByName(
      context.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    val oriented = targets
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"),
        when(struct(col("da"), col("a")) <= struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("p"),
        when(struct(col("da"), col("a")) <= struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("o"))
    oriented
      .join(sym.select(col("a").as("p"), col("b").as("c")), "p")
      .join(sym.select(col("a").as("o"), col("b").as("c")),
        Seq("o", "c"), "left_semi")
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
  }

  /** [[kTrussEdges]]'s full peel TRAJECTORY — (round, a, b) survivor
    * rows for round 0 (the canonical input) through `rounds` — the
    * stored state of the maintained form ([[incrementalKTruss]]), the
    * [[integerKatzTrace]] convention: maintenance replays only the
    * affected region and reads out-of-region per-round membership from
    * this trace. */
  def kTrussTrace(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && k <= 10, "k in [3,10]")
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    var cur = canonicalEdges(edges).localCheckpoint(true)
    val chunks = scala.collection.mutable.ArrayBuffer(
      cur.select(lit(0L).as("round"), col("a"), col("b")))
    for (r <- 1 to rounds) {
      cur = cur
        .join(edgeSupport(cur, cur).where(col("support") >= (k - 2).toLong),
          Seq("a", "b"), "left_semi")
        .localCheckpoint(true)
      chunks += cur.select(lit(r.toLong).as("round"), col("a"), col("b"))
    }
    chunks.reduce(_ unionByName _)
  }

  /** INCREMENTAL [[kTrussEdges]] — the TWELFTH maintained form, the
    * edge-cohesion member (CC q164, LPA q253, PR q304, triangles q306,
    * k-core q308, HITS q310, distances q311, modularity q318, Katz
    * q323, betweenness q324, walks q328, truss this): given the stored
    * peel TRAJECTORY (= [[kTrussTrace]](baseEdges, k, rounds)), the
    * stored final readout (= [[kTrussEdges]] output), and a DISJOINT
    * additive `deltaEdges` wave, produce the (a, b, support) frame
    * IDENTICAL to re-running the batch operator over base ∪ delta.
    *
    * Exactness argument (induction on rounds): an edge's round-r
    * membership diverges from the base run only if its support at
    * round r−1 diverges, which requires a DIVERGENT or DELTA wedge
    * edge sharing one of its endpoints — so divergence spreads at most
    * ONE node-hop per round from the delta endpoints, and after R
    * rounds every divergent edge has an endpoint within R hops (the
    * final support readout probes one more adjacency step: R+1). The
    * maintained replay therefore recomputes only edges with an
    * endpoint inside the (R+1)-ball of the delta endpoints, reading
    * each round's OUT-OF-BALL survivor context from the stored
    * trajectory (membership there is unchanged — the induction), and
    * passes the stored final (a, b, support) rows outside the ball
    * through VERBATIM. Additions are monotone (support only grows), so
    * the replay can only resurrect, never kill, out-of-ball edges —
    * consistent with pass-through.
    *
    * Scale shape: one node ball BFS (cost ∝ touched region), per round
    * one ball-restricted wedge probe (Σ min-degree over BALL edges
    * only) against a context built by scanning — never rewriting — the
    * stored trajectory, and one trace-sized anti-join per round. The
    * full-graph wedge volume is never re-paid. Requires base ∩ delta
    * = ∅ and the same (k, rounds). */
  def incrementalKTruss(prevTrace: DataFrame, prevOut: DataFrame,
      baseEdges: DataFrame, deltaEdges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 3 && k <= 10, "k in [3,10]")
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    val dE = PinnedCache.pin(canonicalEdges(deltaEdges))
    val allE = PinnedCache.pin(
      canonicalEdges(baseEdges).unionByName(dE).distinct())
    val trace = PinnedCache.pin(prevTrace.toDF("round", "a", "b"))
    val out = PinnedCache.pin(prevOut.toDF("a", "b", "support"))
    val sym = allE.unionByName(allE.select(col("b").as("a"), col("a").as("b")))
    val ballNodes = PinnedCache.pin(bfsDistances(sym,
      dE.select(col("a").as("node"))
        .unionByName(dE.select(col("b").as("node"))).distinct(),
      rounds + 1).select(col("node")))
    val affected = PinnedCache.pin(
      allE.join(ballNodes.select(col("node").as("a")), Seq("a"), "left_semi")
        .unionByName(
          allE.join(ballNodes.select(col("node").as("b")), Seq("b"), "left_semi")
            .select(col("a"), col("b")))
        .distinct())
    var curA = affected.localCheckpoint(true)
    for (r <- 1 to rounds) {
      val outOfBall = trace.where(col("round") === (r - 1).toLong)
        .select(col("a"), col("b"))
        .join(affected, Seq("a", "b"), "left_anti")
      val ctx = curA.unionByName(outOfBall)
      curA = curA
        .join(edgeSupport(curA, ctx).where(col("support") >= (k - 2).toLong),
          Seq("a", "b"), "left_semi")
        .localCheckpoint(true)
    }
    val passThrough = trace.where(col("round") === rounds.toLong)
      .select(col("a"), col("b"))
      .join(affected, Seq("a", "b"), "left_anti")
    val finalSet = curA.unionByName(passThrough)
    val inBallOut = curA
      .join(edgeSupport(curA, finalSet), Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
    out.join(affected, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("support"))
      .unionByName(inBallOut)
  }

  /** `canonicalInput = true` asserts `edges` is already CANONICAL —
    * distinct rows, a < b, no self-loops (the [[basketPairs]] /
    * jaccard-pair contract every caller in this repo satisfies). Then
    * e ∪ reverse(e) is duplicate-free by construction and the full-graph
    * `distinct()` exchange is skipped outright (guide §2.4 "a distinct on
    * data that is already unique"); the per-round vote multiset is
    * unchanged. The symmetric frame is additionally hash-partitioned by
    * the join key `a` ONCE before the checkpoint, so every round's
    * sym ⋈ labels join reuses that partitioning instead of re-exchanging
    * the (static) edge frame per round (§2.4 "two operations keyed the
    * same way can share one exchange"). */
  def labelPropagation(edges: DataFrame, rounds: Int,
      canonicalInput: Boolean = false): DataFrame =
    labelPropagationTrace(edges, rounds, canonicalInput).last

  /** [[labelPropagation]]'s full per-round trajectory: labels after
    * rounds 1..`rounds`, each eagerly checkpointed. Synchronous LPA's
    * round-r labels are a pure function of the round-(r−1) state (same
    * inits, same argmin tie rule), so `trace(r-1)` IS
    * `labelPropagation(edges, r)` bit-for-bit — a consumer comparing
    * several round counts (q345's rand index over rounds 2 and 3) runs
    * ONE ladder and reads two prefixes instead of recomputing the shared
    * prefix (guide §2.4; OPTIMIZATION_r14 "not yet optimized" item 5). */
  def labelPropagationTrace(edges: DataFrame, rounds: Int,
      canonicalInput: Boolean = false): Seq[DataFrame] = {
    require(rounds >= 1 && rounds <= 20, "rounds in [1,20]")
    val e = edges.toDF("a", "b")
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val sym0 = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    // The explicit repartition($"a") applies ONLY on the canonical path:
    // the non-canonical path's distinct() already pays a full exchange and
    // its plan must stay byte-identical to the long-green r13 shape — the
    // r14 repartition-under-eager-localCheckpoint exposed a Spark-internal
    // NPE (AdaptiveSparkPlanExec.resetMetrics on a session-less
    // ShuffleExchangeExec) in the driver's gate (VERDICT r14 item 1).
    val sym = (if (canonicalInput) sym0.repartition(col("a")) else sym0.distinct())
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(true)
    (1 to rounds).map { _ =>
      labels = sym
        .join(labels.select(col("node").as("a"), col("lab")), "a")
        .groupBy(col("b").as("node"), col("lab")).agg(count(lit(1)).as("cnt"))
        // argmax by (count desc, label asc) as one struct-min: total order
        .groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lab").as("lab"))).as("s"))
        .select(col("node"), col("s.lab").as("lab"))
        .localCheckpoint(true)
      labels
    }
  }
}
