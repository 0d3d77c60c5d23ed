package graft.audit

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Listener-ASSERTED scale budgets: the way PlanSpec pins plan shapes,
  * this pins what the plans actually move — shuffle bytes, spill, and
  * per-task memory peaks from real TaskMetrics, per operator family, on
  * the sf0.01 tables. A regression that silently de-optimizes a family
  * (loses map-side combine, breaks a broadcast into a shuffle join,
  * shuffles raw shingle sets instead of fixed-width signatures, starts
  * spilling under the default heap) trips a ceiling here even when the
  * result stays correct and the wall-clock noise hides it.
  *
  * Ceilings are ~4× the measured values (recorded in SCALE.md) so AQE
  * task-count wiggle and metadata growth don't flap them, while an
  * order-of-magnitude structural regression cannot pass. */
class ScaleBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def measure(q: String): BudgetSnapshot = {
    graft.ext.PinnedCache.releaseAll()
    spark.catalog.clearCache()
    val (_, b) = TaskBudgetListener.measure(spark) {
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
    }
    info(s"$q: ${b.pretty}")
    b
  }

  private val MB = 1048576L

  test("q01 group-by-sum: map-side partial agg keeps the shuffle to group-row partials") {
    val b = measure("q01_groupby_sum")
    // a handful of groups × 32-ish map partials; raw-row shuffling would
    // move the whole lineitem scan (~MBs) through the exchange
    assert(b.shuffleWriteBytes < 64 * 1024,
      s"partial agg lost: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "agg spilled")
  }

  test("q03 join+agg: the dimension side broadcasts — no join-side shuffle of the fact table") {
    val b = measure("q03_join_agg")
    // only agg partials cross the wire; a regressed sort-merge join would
    // shuffle the joined fact rows (input-sized, MBs)
    assert(b.shuffleWriteBytes < 1 * MB,
      s"broadcast join regressed to a shuffle join: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "join spilled")
  }

  test("q11 top-k: TakeOrderedAndProject ships k rows per partition, not a global sort") {
    val b = measure("q11_topk")
    assert(b.shuffleWriteBytes < 256 * 1024,
      s"top-k shuffled more than per-partition heads: shufW=${b.shuffleWriteBytes}")
  }

  test("q24 exact dedup: hash-groupBy shuffles digests, not documents") {
    val b = measure("q24_dedup_exact")
    // the exchange carries (digest, id) pairs — document text (~1.5 MB at
    // sf0.01) must be pruned before the shuffle
    assert(b.shuffleWriteBytes < 2 * MB,
      s"dedup shuffled document payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "dedup spilled")
  }

  test("q26 MinHash LSH: fixed-width signatures cross the wire, not shingle sets") {
    val b = measure("q26_jaccard_pairs")
    // sigs are B band-longs per doc + bucket-join traffic; shuffling raw
    // shingle sets would be input-sized or larger
    assert(b.shuffleWriteBytes < 4 * MB,
      s"LSH shuffled shingle payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "LSH spilled")
  }

  test("q133 HyperLogLog: register-array-bounded state, sketch-sized shuffle") {
    val b = measure("q133_hll_distinct")
    // 2^p byte-ish registers per (group, partition) partial — constant in
    // row count; an exact-distinct regression shuffles every distinct key
    assert(b.shuffleWriteBytes < 2 * MB,
      s"HLL shuffle not sketch-bounded: shufW=${b.shuffleWriteBytes}")
  }

  test("q139 exact triangles: oriented wedge volume stays near O(m^1.5), zero spill") {
    val b = measure("q139_triangle_count")
    // sf0.01 co-purchase graph ~119k edges; orientation bounds the
    // wedge-join exchange to a few MB — naive Σdeg² wedges would be 10-100×
    assert(b.shuffleWriteBytes < 16 * MB,
      s"wedge exchange blew past the orientation bound: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "triangles spilled")
  }

  test("q132 integer PageRank: per-iteration rank join + combinable sum, bounded exchange") {
    val b = measure("q132_pagerank")
    // 4 Pregel rounds over a ~120k-edge graph move ~0.9 MB of (node, long)
    // partials; a lost map-side combine would shuffle edge-sized frames
    assert(b.shuffleWriteBytes < 8 * MB,
      s"PageRank exchange not partial-agg bounded: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "pagerank spilled")
  }

  test("q164 incremental CC: only the stars-plus-delta subgraph shuffles") {
    val b = measure("q164_incremental_cc")
    // measured 1.2 MB: base CC + star contraction + merged CC — a
    // regression to full-history recomputation re-shuffles the whole
    // accumulated pair pipeline every wave
    assert(b.shuffleWriteBytes < 8 * MB,
      s"incremental CC shuffled beyond the touched subgraph: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "incremental CC spilled")
  }

  test("q171 link extraction: map-only until the host-pair rollup") {
    val b = measure("q171_link_graph")
    // HTML render + regex extraction stay inside the scan projection; the
    // only exchange is the (host, host) count rollup (~0.1 MB)
    assert(b.shuffleWriteBytes < 2 * MB,
      s"link extraction shuffled page payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "link graph spilled")
  }

  test("q187 BFS: frontier joins ship (node, dist) pairs, never the corpus") {
    val b = measure("q187_bfs_frontier")
    // measured 0.2 MB total across 4 delta-frontier rounds on the host
    // graph; a regression to full-set re-expansion or an unpinned edge
    // pipeline re-running the HTML render would blow through this
    assert(b.shuffleWriteBytes < 1 * MB,
      s"BFS shuffled beyond frontier state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "BFS spilled")
  }

  test("q196 centroid matrix: only the labels×dims model state crosses the wire") {
    val b = measure("q196_centroid_matrix")
    // per-dim sums are 10 labels × 64 dims of longs; shuffling the
    // exploded vector stream instead would be input-sized (MBs)
    assert(b.shuffleWriteBytes < 256 * 1024,
      s"centroid sums lost map-side combine: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0)
  }

  test("q198 growth accounting: windows run over the (user, week) distinct rollup") {
    val b = measure("q198_growth_accounting")
    assert(b.shuffleWriteBytes < 512 * 1024,
      s"growth accounting shuffled the raw event stream: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0)
  }

  test("q200 CUSUM: dense hour grid stays rollup-sized; single-partition window bounded") {
    val b = measure("q200_cusum_drift")
    // types × span-hours cells (~3.6k rows); the two window passes share
    // one exchange (PlanSpec) so bytes stay one-grid-sized
    assert(b.shuffleWriteBytes < 512 * 1024,
      s"CUSUM shuffled more than the hour grid: shufW=${b.shuffleWriteBytes}")
    assert(b.peakExecMem < 512 * MB, s"peakTaskMem=${b.peakExecMem}")
  }

  test("q204 debounce: one (user,type)-keyed window, gap flags only") {
    val b = measure("q204_debounce")
    assert(b.shuffleWriteBytes < 2 * MB,
      s"debounce shuffled beyond the keyed window: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "debounce spilled")
  }

  test("q183 label propagation: per-round label joins stay graph-sized, zero spill") {
    val b = measure("q183_lpa_communities")
    // measured 13 MB across 3 sync rounds on the co-purchase graph; a
    // lost checkpoint re-running the edge pipeline per round would
    // multiply this out
    assert(b.shuffleWriteBytes < 64 * MB,
      s"LPA shuffled beyond per-round label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "LPA spilled")
  }

  test("q209 stationary distribution: transition matrix stays model-state sized") {
    val b = measure("q209_stationary_dist")
    // |types|² transition cells through 4 iterations — ~KBs; shuffling the
    // raw event stream instead would be MBs
    assert(b.shuffleWriteBytes < 2 * MB,
      s"stationary iteration shuffled the stream: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0)
  }

  test("q212 peak concurrency: boundary sweep runs over the session rollup only") {
    val b = measure("q212_peak_concurrency")
    assert(b.shuffleWriteBytes < 4 * MB,
      s"sweep shuffled beyond session boundaries: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0)
  }

  test("q253 incremental LPA: ball-bounded re-propagation over the sparse dup graph") {
    val b = measure("q253_incremental_lpa")
    // the LSH pair pipeline dominates; the BFS ball + restricted LPA add
    // only node-keyed partials over the tiny dup graph
    assert(b.shuffleWriteBytes < 16 * MB,
      s"incremental LPA shuffled beyond the touched subgraph: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q253 spilled")
  }

  test("q254 salted join: hot-key scatter adds only replication-sized shuffle") {
    val b = measure("q254_salted_join")
    assert(b.shuffleWriteBytes < 8 * MB,
      s"salted join shuffled beyond the keyed fact: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q254 spilled")
  }

  test("q258 longest repeat: O(1)-wide prefix-pair rows, no token payload in the self-join") {
    val b = measure("q258_max_repeat")
    // len²/2 numeric rows per doc (~190k at sf0.01) through one doc-keyed
    // self-join + partial agg; shuffling gram TEXT instead would be 10x
    assert(b.shuffleWriteBytes < 32 * MB,
      s"repeat scan shuffled token payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q258 spilled")
  }

  test("q278 rank-sum AUC: per-source windows shuffle scored rows once, margins not text") {
    val b = measure("q278_classifier_auc")
    // (source, margin, pos) triples through one source-keyed exchange; the
    // document text must be gone before the window sort
    assert(b.shuffleWriteBytes < 2 * MB,
      s"AUC shuffled doc payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q278 spilled")
  }

  test("q280 A/A monitor: one conditional-sum rollup — day partials only") {
    val b = measure("q280_aa_test")
    // 30 day-rows × map partials; raw event rows through the exchange
    // would be input-sized (MBs)
    assert(b.shuffleWriteBytes < 256 * 1024,
      s"A/A rollup lost map-side combine: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q280 spilled")
  }

  test("q287 CUPED: per-user moments then a single-row reduce — no raw-event second pass") {
    val b = measure("q287_cuped_lift")
    assert(b.shuffleWriteBytes < 4 * MB,
      s"CUPED shuffled beyond user partials: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q287 spilled")
  }

  test("q289 CDC chunking: token hashes cross the doc-keyed exchange once, chunks partial-agg") {
    val b = measure("q289_cdc_chunks")
    // (doc, p, h) longs through one window exchange + (doc, chunk) rollup;
    // token strings in the shuffle would multiply this
    assert(b.shuffleWriteBytes < 8 * MB,
      s"CDC shuffled token text: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q289 spilled")
  }

  test("q304 incremental PageRank: ball-bounded re-iteration over the sparse dup graph") {
    val b = measure("q304_incremental_pagerank")
    // the LSH pair pipeline + base PR (the proof obligation) dominate; the
    // forward/backward balls and the restricted recurrence add only
    // node-keyed partials over the touched region
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental PR shuffled beyond the touched subgraph: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q304 spilled")
  }

  test("q305 dedup advisor: sample-bounded exact stage, signature-sized band joins") {
    val b = measure("q305_dedup_config_advisor")
    // unigram sets on the 1/10 audit sample; the quadratic exact stage and
    // both band joins shuffle ids/signatures, never document text, and the
    // per-cutoff stats are conditional sums over ONE pinned pair frame
    // measured 0.1 MB at sf0.01
    assert(b.shuffleWriteBytes < 1 * MB,
      s"advisor shuffled beyond the audit sample: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q305 spilled")
  }

  test("q306 incremental triangles: radius-1 region recount over the dup graph") {
    val b = measure("q306_incremental_triangles")
    // pair pipeline + base triangle count dominate (the proof obligation);
    // the wedge-close affected set, ball hop, and sub-count add oriented
    // wedges over ball-incident edges only
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental triangles shuffled beyond the ball: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q306 spilled")
  }

  test("q307 harmonic centrality: node-keyed MS-BFS mask words, not candidate pairs") {
    val b = measure("q307_harmonic_centrality")
    // bitmask multi-source BFS: per-round shuffle is |edges|*ceil(seeds/64)
    // bit_or-combinable mask words — measured 0.4 MB at sf0.01 (the old
    // pair-keyed plan moved 6.5 MB; a regression back to (seed, node)
    // candidate shuffling trips this)
    assert(b.shuffleWriteBytes < 4 * MB,
      s"harmonic BFS shuffled beyond mask words: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q307 spilled")
  }

  test("q308 incremental k-core: 2R-ball re-peel over the dup graph") {
    val b = measure("q308_incremental_kcore")
    // pair pipeline + base peel dominate (the proof obligation); the ball
    // BFS and restricted re-peel move node-keyed partials only
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental k-core shuffled beyond the ball: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q308 spilled")
  }

  test("q309 distance histogram: MS-BFS mask words + a rounds-sized cumulative window") {
    val b = measure("q309_distance_histogram")
    // same MS-BFS substrate as q307 (measured 0.4 MB at sf0.01); the
    // cumulative window runs over a <= rounds-row frame (model state)
    assert(b.shuffleWriteBytes < 4 * MB,
      s"distance histogram shuffled beyond mask words: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q309 spilled")
  }

  test("q310 incremental HITS: ball-restricted replays, node-keyed partials only") {
    val b = measure("q310_incremental_hits")
    // pair pipeline + base HITS-with-trace dominate (the proof obligation);
    // the undirected ball growth and the TWO restricted replays (base for
    // attainer counts, union for new values) move node-keyed partials over
    // ball-incident edges only — never documents or shingle sets
    assert(b.shuffleWriteBytes < 4 * MB,
      s"incremental HITS shuffled beyond the ball: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q310 spilled")
  }

  test("q311 incremental harmonic: injection + improvement-only relaxation rounds") {
    val b = measure("q311_incremental_harmonic")
    // base MS-BFS (the proof obligation) dominates; the round-12
    // bitmask-layered maintenance moves ⌈seeds/64⌉-packed mask words for
    // injection / relaxation / improvement tests instead of pair-keyed
    // (seed, node, d) rows — measured 4.0 MB at sf0.01 (was 27.4 MB
    // pair-keyed in r11)
    assert(b.shuffleWriteBytes < 6 * MB,
      s"incremental BFS shuffled beyond mask words: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q311 spilled")
  }

  test("q324 incremental betweenness: reverse-ball seed pruning + per-seed DAG recompute") {
    val b = measure("q324_incremental_betweenness")
    // base trace (the proof obligation) + one reverse-ball BFS + the
    // affected seeds' forward/backward ladders; the pass-through is a
    // seed-keyed anti-join over the trace, never recomputed
    // measured 0.5 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental betweenness shuffled beyond affected DAGs: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q324 spilled")
  }

  test("q325 skip-gram pairs: offset explode + exact-key self-join, corpus-sized") {
    val b = measure("q325_skipgram_pairs")
    // corpus x 2w probe rows through ONE equi-join + one combinable
    // count — never a range join, never per-walk collect_list
    // measured 0.6 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"skip-gram shuffled beyond corpus x offsets: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q325 spilled")
  }

  test("q328 incremental walks: touched-origin semi-join + replay, corpus never rewritten") {
    val b = measure("q328_incremental_walks")
    // base corpus gen (the proof obligation) dominates; maintenance adds
    // one corpus x delta-srcs semi-join and a touched-origins replay
    // measured 0.5 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental walks shuffled beyond the touched region: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q328 spilled")
  }

  test("q329 incremental k-truss: ball-restricted wedges, trajectory-scanned context") {
    val b = measure("q329_incremental_ktruss")
    // base trace + readout (the proof obligation) dominate; maintenance
    // adds the node ball BFS, per-round BALL-edge wedges against a
    // context scanned from the stored trajectory, and trace-sized
    // anti-joins — never a full-graph wedge re-pay
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental truss shuffled beyond the ball: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q329 spilled")
  }

  test("q333 SCC: per-round O(m) min-label joins, trim anti-joins, never all-pairs") {
    val b = measure("q333_scc_goods_flow")
    // 2 outer x (trim + 6 fwd min-label + 6 colored backward) rounds,
    // each one edges-frontier join + combinable rollup on the
    // goods-flow graph — the integerPageRank per-round shape
    // measured 0.9 MB at sf0.01
    assert(b.shuffleWriteBytes < 4 * MB,
      s"SCC shuffled beyond per-round label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q333 spilled")
  }

  test("q334 edge betweenness: seeds x ball terms, never edge-squared") {
    val b = measure("q334_edge_betweenness")
    // the q312 ladder with per-edge term capture — the level-term frame
    // serves both the edge rollup and the node dependency update
    // measured 0.5 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"edge betweenness shuffled beyond ladder terms: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q334 spilled")
  }

  test("q335 GN split: ladder + 1-row broadcast argmax + CC, no all-pairs") {
    val b = measure("q335_girvan_newman_split")
    // edge betweenness (q334's band) + a TakeOrdered 1-row argmax
    // broadcast-filtered into min-label CC rounds
    // measured 1.1 MB at sf0.01
    assert(b.shuffleWriteBytes < 4 * MB,
      s"GN split shuffled beyond ladder + CC label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q335 spilled")
  }

  test("q336 incremental edge betweenness: reverse-ball seed pruning over the edge trace") {
    val b = measure("q336_incremental_edge_betweenness")
    // base edge trace (the proof obligation) + one reverse-ball BFS +
    // affected seeds' ladders; the pass-through is one seed-keyed
    // anti-join over the edge-term trace
    // measured 0.7 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental edge betweenness shuffled beyond affected DAGs: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q336 spilled")
  }

  test("q326 k-truss: arboricity-bounded wedge support, never all-pairs") {
    val b = measure("q326_ktruss")
    // the jaccard pair gen dominates (the q318/q320 band); each truss
    // round probes from the lower-degree endpoint — min(deg) fan-out
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"k-truss shuffled beyond wedges: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q326 spilled")
  }

  test("q327 modularity move: neighbor-label rollup + community-sized tot, one argmax") {
    val b = measure("q327_modularity_move")
    // one sym x labels join + (node, lab) rollup, a community-sized tot
    // rollup, one struct-min aggregate — Pregel-shaped, no all-pairs
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"modularity move shuffled beyond label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q327 spilled")
  }

  test("q337 conductance: boundary rollups ride the q313 LPA band") {
    val b = measure("q337_conductance")
    // the 2-round LPA dominates (q313's band); conductance adds two
    // label joins + a cut rollup + a 1-row m broadcast
    assert(b.shuffleWriteBytes < 64 * MB,
      s"conductance shuffled beyond label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q337 spilled")
  }

  test("q338 incremental conductance: recount pruned to affected communities") {
    val b = measure("q338_incremental_conductance")
    // pair gen + base LPA dominate (the q318 band); the maintenance adds
    // semi-join-pruned recounts and a broadcast-scalar phi rescale
    // measured 0.4 MB at sf0.01
    assert(b.shuffleWriteBytes < 2 * MB,
      s"incremental conductance shuffled beyond affected communities: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q338 spilled")
  }

  test("q313 modularity: community rollups shuffle graph-sized longs, 1-row m broadcast") {
    val b = measure("q313_modularity")
    // the LPA rounds dominate (the q183 band); the modularity stage adds
    // two label joins + community-sized rollups — nothing document-sized
    assert(b.shuffleWriteBytes < 64 * MB,
      s"modularity shuffled beyond label state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q313 spilled")
  }

  test("q314 random walks: per-hop frontier joins are walk-count sized") {
    val b = measure("q314_random_walks")
    // |walks| rows join the indexed adjacency per hop — the corpus never
    // shuffles; a regressed plan materializing neighbor lists per walk
    // would be |walks|·deg sized
    assert(b.shuffleWriteBytes < 4 * MB,
      s"walks shuffled beyond frontiers: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q314 spilled")
  }

  test("q315 DSIR selection: bucket counts broadcast back; one doc rollup; top-k boundary") {
    val b = measure("q315_dsir_selection")
    // the token stream shuffles once (doc-keyed rollup of (b, term) longs);
    // the 256-bucket model and the top-100 flag travel as broadcasts
    assert(b.shuffleWriteBytes < 2 * MB,
      s"DSIR shuffled beyond the doc rollup: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q315 spilled")
  }

  test("q316 k-center: per-round point-keyed min against a broadcast center set") {
    val b = measure("q316_kcenter_coreset")
    // k rounds × (|points| distance rows → point-keyed min + top-1);
    // centers are collected model state — never a point×point matrix
    assert(b.shuffleWriteBytes < 2 * MB,
      s"k-center shuffled beyond point mins: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q316 spilled")
  }

  test("q322 Katz: per-round rank join + dst-keyed combinable sum, PageRank's band minus the degree join") {
    val b = measure("q322_katz_centrality")
    assert(b.shuffleWriteBytes < 4 * MB,
      s"Katz exchange not partial-agg bounded: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q322 spilled")
  }

  test("q323 incremental Katz: ball-restricted replay + trace reads, proof-obligation query") {
    val b = measure("q323_incremental_katz")
    // base trace (iters×nodes longs) + forward-ball expansion + the
    // restricted recurrence — node-keyed partials throughout
    assert(b.shuffleWriteBytes < 4 * MB,
      s"incremental Katz shuffled beyond ball + trace state: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q323 spilled")
  }

  test("q340 link prediction: wedge candidates rollup to (u, v) partials, no pair materialization past the agg") {
    val b = measure("q340_link_prediction")
    // the wedge self-join fans out inside one stage; only (u, v, cn, ra)
    // partials cross the exchange — a candidate-row shuffle would move
    // the full wedge volume
    assert(b.shuffleWriteBytes < 16 * MB,
      s"link prediction shuffled the wedge fan-out: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q340 spilled")
  }

  test("q342 incremental assortativity: scalar maintenance — ball-sized frames + four-number state") {
    val b = measure("q342_incremental_assortativity")
    // base stats (1 row) + touched/incident/ball frames + degree scans;
    // nothing graph-sized crosses an exchange
    assert(b.shuffleWriteBytes < 2 * MB,
      s"scalar maintenance shuffled the graph: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q342 spilled")
  }

  test("q345 rand index: contingency-sized agreement state over two LPA ladders") {
    val b = measure("q345_rand_index")
    // two LPA label ladders (the q313 per-round rollup band) + one
    // (la, lb) contingency rollup — never a node-pair enumeration
    assert(b.shuffleWriteBytes < 48 * MB,
      s"rand index shuffled beyond the LPA band + contingency: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q345 spilled")
  }

  test("q346 global transitivity: the oriented-wedge band + a 1-row rollup") {
    val b = measure("q346_global_transitivity")
    // triangleCounts' O(m^1.5)-bounded oriented wedges + one scalar agg
    assert(b.shuffleWriteBytes < 8 * MB,
      s"transitivity shuffled beyond the triangle band: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q346 spilled")
  }

  test("q321 bitmap distinct: 64-packed words cross the wire, not (day, user) pairs") {
    val b = measure("q321_bitmap_distinct")
    // ~3 words/day × 30 days of (grp, w, mask) longs; the pair-shuffling
    // count-distinct equivalent moves 64× the id payload
    assert(b.shuffleWriteBytes < 256 * 1024,
      s"bitmap distinct lost the word packing: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q321 spilled")
  }

  test("q319 pass@k: one task-keyed count rollup, arithmetic per task row") {
    val b = measure("q319_pass_at_k")
    // (task, n, c) partials only — the event stream shuffles once as
    // count pairs, never as rows
    assert(b.shuffleWriteBytes < 1 * MB,
      s"pass@k shuffled beyond task counts: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q319 spilled")
  }

  test("q320 Bradley-Terry: pair-table-sized MM rounds over the dup-graph matches") {
    val b = measure("q320_bradley_terry")
    // LSH pair gen dominates (the q26 band); the MM rounds move
    // (source, source, long) rows — model-state sized
    assert(b.shuffleWriteBytes < 2 * MB,
      s"BT shuffled beyond the match table: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q320 spilled")
  }

  test("q317 node2vec: per-hop candidate fan-out is frontier×degree, edges checkpointed once") {
    val b = measure("q317_node2vec_walks")
    // |walks|·deg(cur) weighted candidates per hop + the (origin, walk)
    // cumulative window — the unavoidable second-order footprint; the
    // graph itself never re-shuffles
    assert(b.shuffleWriteBytes < 16 * MB,
      s"node2vec shuffled beyond hop candidates: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q317 spilled")
  }

  test("q318 incremental modularity: recount pruned to affected communities") {
    val b = measure("q318_incremental_modularity")
    // LSH pair gen + base/incremental LPA dominate (the q253 band); the
    // maintained-stats stage adds semi-join-pruned rollups only
    assert(b.shuffleWriteBytes < 4 * MB,
      s"incremental modularity shuffled beyond the touched region: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q318 spilled")
  }

  test("q312 betweenness: path-count frontiers + per-level dependency joins only") {
    val b = measure("q312_betweenness_centrality")
    // 2-seed Brandes: forward (seed, node, sigma) frontiers with the
    // settled/frontier split, then per-level (sigma, dd) joins — state is
    // seeds×ball longs, never documents
    assert(b.shuffleWriteBytes < 32 * MB,
      s"betweenness shuffled beyond labeled frontiers: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q312 spilled")
  }

  test("q355 butterfly census: co-pair partials cross the wire, never a butterfly materialization") {
    val b = measure("q355_butterfly_count")
    // one order-keyed wedge self-join + (r1, r2) rollup partials + a
    // 1-row readout; materializing Σ C(w,2) butterflies would be
    // combinatorially larger than the co-pair frame
    assert(b.shuffleWriteBytes < 8 * MB, // measured 1.7 MB
      s"butterfly shuffled beyond co-pair partials: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q355 spilled")
  }

  test("q357 spearman: distinct-value rank frames broadcast back; moments ride 1-row partials") {
    val b = measure("q357_spearman")
    // part rollup partials + two distinct-value rollups; the rank
    // frames broadcast-join back so no row-sized exchange follows
    assert(b.shuffleWriteBytes < 1 * MB, // measured 0.1 MB
      s"spearman shuffled row-sized rank frames: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q357 spilled")
  }

  test("q359 map/mrr: broadcast query set — shuffle is the qid-windowed candidate frame") {
    val b = measure("q359_map_mrr")
    // 20 queries broadcast against the corpus; only (qid, nid, sim)
    // candidates shuffle to the per-qid rank window, then 1-row means
    assert(b.shuffleWriteBytes < 1 * MB, // measured < 0.1 MB
      s"map/mrr shuffled vector payloads: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q359 spilled")
  }

  test("q364 degraded minutes: day-keyed sweep rows only — no global sort") {
    val b = measure("q364_degraded_minutes")
    // error events keyed by day for the islands sweep + island partials
    assert(b.shuffleWriteBytes < 1 * MB, // measured < 0.1 MB
      s"interval union shuffled beyond day-keyed events: shufW=${b.shuffleWriteBytes}")
    assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, "q364 spilled")
  }

  test("per-task peak execution memory stays executor-slot-sized across the pinned families") {
    // at 100 TB an executor slot has ~1-4 GB of execution memory; a task
    // peaking far above that on sf0.01 inputs signals driver-ish state
    // hiding inside an operator. 256 MB is ~4x the worst measured peak.
    for (q <- Seq("q01_groupby_sum", "q03_join_agg", "q24_dedup_exact",
        "q26_jaccard_pairs", "q139_triangle_count")) {
      val b = measure(q)
      assert(b.peakExecMem < 256 * MB, s"$q peakTaskMem=${b.peakExecMem}")
    }
  }
}
