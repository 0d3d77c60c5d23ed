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

  /** ANN configuration for the [[topKCandidates]] seam. `tables`/`bits`/
    * `nprobe` drive the multiprobe path (and `nprobe` the IVF probe
    * count); `numCentroids` the IVF list count. The defaults are the
    * measured cost/recall trade; AnnSeamSpec pins a configuration
    * (tables=8, bits=4, nprobe=5) whose candidate sets provably contain
    * the true top-1 on the template corpus at the gate sfs. */
  final case class AnnParams(tables: Int = 4, bits: Int = 4, nprobe: Int = 4,
      numCentroids: Int = 16)

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

  /** Unified top-k CANDIDATE stage — the seam every consumer of "find my
    * nearest neighbors" routes through so the brute/ANN trade is a
    * PARAMETER, not a rewrite: `brute` is the exact reference scan
    * ([[bruteForceTopK]]); `ivf` probes inverted lists
    * ([[ivfTopK]] / [[ivfTopKWith]] — `selfSet = true` switches to the
    * co-partitioned inverted-list join for corpus-scale query sets, the
    * q192/knnLabelAudit shape, instead of broadcasting a corpus-sized
    * probe set); `multiprobe` is the few-tables RHP-LSH path
    * ([[multiProbeTopK]]). All three rank with the same
    * (sim desc, nid) tie rule, so when the candidate set contains the
    * true top-k the OUTPUT is bit-identical to brute — the property
    * AnnSeamSpec asserts at the gate sfs, with the recall gate bounding
    * the sf0.1 behavior. */
  def topKCandidates(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, candidates: String = "brute",
      selfSet: Boolean = false, ann: AnnParams = AnnParams()): DataFrame =
    candidates match {
      case "brute" => bruteForceTopK(corpus, queries, vecCol, idCol, k)
      case "ivf" =>
        if (!selfSet)
          ivfTopK(corpus, queries, vecCol, idCol, k, ann.numCentroids, ann.nprobe)
        else {
          val cents: Array[(Long, Seq[Float], Double)] =
            withNorm(corpus.where(col(idCol) < ann.numCentroids), vecCol)
              .select(col(idCol).cast("long"), col(vecCol), col("nrm"))
              .collect()
              .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
              .sortBy(_._1)
          ivfTopKWith(cents, corpus, queries, vecCol, idCol, k, ann.nprobe,
            broadcastProbes = false)
        }
      case "multiprobe" =>
        multiProbeTopK(corpus, queries, vecCol, idCol, k, ann.tables, ann.bits,
          ann.nprobe)
      case other => throw new IllegalArgumentException(
        s"candidates must be brute|ivf|multiprobe, got '$other'")
    }

  /** Mutual nearest-neighbor pairs (q192's operator form): (a, b) where
    * each is the other's top-1 under the chosen candidate stage —
    * reciprocal best match kills the asymmetric hub matches plain top-1
    * keeps. `candidates = "brute"` is the exact reference semantics the
    * oracle replicates; `ivf` / `multiprobe` are the EXECUTED scale paths
    * (self-set shape: both sides corpus-scale, so the ivf branch uses the
    * co-partitioned inverted-list join, never a corpus-sized broadcast).
    * AnnSeamSpec pins ANN == brute on the template corpus at the gate sfs
    * and gates recall at sf0.1. */
  def mutualKnn(emb: DataFrame, vecCol: String, idCol: String,
      candidates: String = "brute", ann: AnnParams = AnnParams()): DataFrame = {
    val top1 = PinnedCache.pin(
      topKCandidates(emb, emb, vecCol, idCol, 1, candidates, selfSet = true, ann))
    top1.as("x").join(top1.as("y"),
        col("x.qid") === col("y.nid") && col("x.nid") === col("y.qid") &&
          col("x.qid") < col("x.nid"))
      .select(col("x.qid").as("a_id"), col("x.nid").as("b_id"),
        col("x.sim").as("cos_sim"))
  }

  /** Matryoshka-truncated retrieval: exact top-k over the FIRST `dims`
    * components of each embedding (the MRL serving trick — prefix
    * sub-vectors of nested-trained embeddings retain most retrieval
    * quality at a fraction of the dot-product and memory cost). Truncation
    * is a map-only `slice`; everything downstream is [[bruteForceTopK]]
    * over `dims`-wide vectors, so the scan costs dims/fullDim of the full
    * pass — the standard cheap first-stage before full-dim re-rank.
    * Deterministic: same left-to-right fold as every other cosine here. */
  def truncatedTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dims: Int, k: Int): DataFrame = {
    require(dims >= 1, "dims must be positive")
    def trunc(df: DataFrame) = df.withColumn(vecCol, slice(col(vecCol), 1, dims))
    bruteForceTopK(trunc(corpus), trunc(queries), vecCol, idCol, k)
  }

  /** Maximal-marginal-relevance (MMR) diversified top-k: per query, pick k
    * results greedily, each step maximizing
    * `lam·rel(c) − (1−lam)·max_{s∈selected} cos(c, s)` — relevance minus
    * redundancy, the near-dup-aware serving-side complement to the
    * corpus-side dedup operators (a retrieval pool full of near-identical
    * docs returns one of them plus genuinely different material).
    * Returns (qid, nid, step, rel), step = 1..k in selection order.
    *
    * Shape: stage 1 is the [[topKCandidates]] seam (`candidates` picks
    * brute for the exact reference semantics, ivf/multiprobe as the
    * executed scale paths; m bounds everything downstream); the m²
    * within-pool similarity matrix and the k greedy rounds are all keyed
    * by qid, so per-query work is m²·k with NO cross-query interaction —
    * embarrassingly parallel over queries. The k rounds are k chained
    * qid-partitioned windows (greedy selection is inherently sequential
    * IN k, not in queries or candidates).
    *
    * Determinism: rel and csim use the engine-wide left-to-right fold
    * convention; the score combines them with the SAME double literals the
    * oracle interpolates (including the IEEE value of 1−lam), and ties
    * break on (score desc, nid) — bit-reproducible cross-engine.
    *
    * EXECUTION CONTRACT: unlike the other operators here, this one runs
    * EAGERLY — each of the k greedy steps collect()s its picks (model
    * state, ≤ queries×1 rows per step, ≤ queries×k total) and the return
    * value is a driver-local relation, not a lazy distributed plan. Do
    * not compose it expecting deferred execution; the distributed work
    * (candidate gen, pair sims, per-step argmax) still runs on the
    * cluster. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, m: Int, k: Int, lam: Double = 0.7,
      candidates: String = "brute", ann: AnnParams = AnnParams()): DataFrame = {
    require(m >= k && k >= 1, "need m >= k >= 1")
    val cands = graft.ext.PinnedCache.pin(
      topKCandidates(corpus, queries, vecCol, idCol, m, candidates, ann = ann)
        .select(col("qid"), col("nid"), col("sim").as("rel")))
    val vecs = withNorm(corpus, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("v"), col("nrm"))
    val withVec = cands.join(vecs, "nid")
    val pairSims = graft.ext.PinnedCache.pin(withVec.as("a")
      .join(withVec.as("b"),
        col("a.qid") === col("b.qid") && col("a.nid") =!= col("b.nid"))
      .select(col("a.qid").as("qid"), col("a.nid").as("a_id"),
        col("b.nid").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("csim")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
    // The selection frame is MODEL STATE — at most queries×k (qid, nid,
    // step, rel) rows — so each step's pick is COLLECTED and re-planted as
    // a LocalRelation (the q293 value-iteration precedent). The previous
    // formulation re-derived `selected` AND `remaining` as growing Catalyst
    // plans, roughly doubling analyzed-plan size per step: harmless at
    // k = 4, but at k ≈ 15+ the ANALYZER became the bottleneck. Now every
    // step's distributed work (maxSim over pinned pairSims + the window
    // pick) joins against a constant-depth local frame; values round-trip
    // through collect() exactly (longs/doubles bit-preserved), so results
    // are bit-identical to the chained-plan form (MmrSpec pins k = 20).
    val spark = corpus.sparkSession
    val first = cands.withColumn("score", col("rel"))
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("qid"), col("nid"), lit(1L).as("step"), col("rel"))
    val schema = first.schema
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    rows ++= first.collect()
    def selectedLocal: DataFrame = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.toSeq).asJava), schema)
    for (step <- 2 to k) {
      val sel = selectedLocal
      val maxSim = pairSims
        .join(sel.select(col("qid"), col("nid").as("b_id")), Seq("qid", "b_id"))
        .groupBy(col("qid"), col("a_id"))
        .agg(max(col("csim")).as("msim"))
        .select(col("qid"), col("a_id").as("nid"), col("msim"))
      val pick = cands
        .join(sel.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_anti")
        .join(maxSim, Seq("qid", "nid"))
        .withColumn("score", lit(lam) * col("rel") - lit(1 - lam) * col("msim"))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("qid"), col("nid"), lit(step.toLong).as("step"), col("rel"))
      rows ++= pick.collect()
    }
    selectedLocal
  }

  /** Greedy k-CENTER coreset selection (the Gonzalez max-min farthest-
    * point traversal — a 2-approximation of the optimal k-center cover):
    * pick the lowest-id point, then k−1 times the point FARTHEST (in
    * cosine distance 1−cos) from everything selected so far, ties by
    * ascending id. The returned `gap` of each pick is the covering
    * radius the coreset had BEFORE that pick — the classic data-
    * selection readout (how much diversity each additional exemplar
    * buys; used for coreset-based training-data subsetting the way DSIR
    * is used for distribution matching).
    *
    * Determinism: distances are the engine-wide left-to-right double
    * fold; min-over-centers and max-argmax are order-free comparisons;
    * ties break on id — bit-reproducible cross-engine.
    *
    * EXECUTION CONTRACT: eager, like [[mmrTopK]] — each round collects
    * its ONE pick (model state) and re-plants it as a LocalRelation, so
    * the distributed per-round work (a |points| × |selected| broadcast
    * cross + a point-keyed min + a top-1) runs against a constant-depth
    * plan. k rounds of one pass each = O(k·n) distances, the textbook
    * schedule; the k centers are always driver-small. If k exceeds the
    * point count the traversal just stops early (fewer rows back). */
  def kCenterCoreset(df: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k in [1,1000]")
    val spark = df.sparkSession
    val pts = graft.ext.PinnedCache.pin(withNorm(df, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm")))
    val first = pts.orderBy(col("id")).limit(1)
      .select(col("id"), col("v"), col("nrm"),
        lit(1L).as("step"), lit(0.0).as("gap"))
    val schema = first.schema
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    rows ++= first.collect()
    def centersLocal: DataFrame = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.toSeq).asJava), schema)
    var exhausted = false
    for (step <- 2 to k if !exhausted) {
      val ctr = centersLocal
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val mind = pts
        .join(ctr.select(col("cid")), col("id") === col("cid"), "left_anti")
        .crossJoin(broadcast(ctr))
        .select(col("id"),
          (lit(1.0) - dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
            .as("dist"))
        .groupBy(col("id")).agg(min(col("dist")).as("gap"))
      val pick = mind.join(pts, "id")
        .orderBy(col("gap").desc, col("id")).limit(1)
        .select(col("id"), col("v"), col("nrm"),
          lit(step.toLong).as("step"), col("gap"))
      val got = pick.collect()
      // every point selected: stop — k-n further rounds would each run
      // the full distributed pass just to collect nothing
      if (got.isEmpty) exhausted = true else rows ++= got
    }
    centersLocal.select(col("step"), col("id").as("center_id"), col("gap"))
  }

  /** Hard-negative mining for contrastive training: per anchor vector,
    * the `k` MOST-similar vectors carrying a DIFFERENT label — the
    * near-miss negatives that make embedding/classifier training sharp
    * (easy negatives are information-free; in-batch negatives are
    * luck-of-the-draw). Exact brute scan with the label filter BEFORE
    * ranking is the reference semantics (post-filtering an ANN top-m can
    * under-fill a query whose m nearest are all same-label); the scale
    * swap is [[topKCandidates]] with a DEEP m + this same filter.
    * Measured caveat (AnnSeamSpec): hard negatives sit at mid-cosine,
    * where LSH collision probability decays — the swap's recall is
    * 0.987-0.997 under the strong config at the gate sfs (gated >= 0.98),
    * not the exact-equality the near-neighbor consumers get; equality
    * needs ~4x the tables. Ties break (sim desc, nid) — fully
    * deterministic, oracle-replicable. */
  def hardNegatives(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, k: Int): DataFrame = {
    val n = withNorm(corpus, vecCol)
      .select(col(idCol).as("id"), col(labelCol).as("lab"),
        col(vecCol).as("v"), col("nrm"))
    val sims = n.as("a").join(n.as("b"),
        col("a.id") =!= col("b.id") && col("a.lab") =!= col("b.lab"))
      .select(col("a.id").as("qid"), col("a.lab").as("label"),
        col("b.id").as("nid"), col("b.lab").as("neg_label"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid"), col("label"), col("nid"), col("neg_label"),
        col("sim"), col("rk"))
  }

  /** All pairs (a < b) with cosine >= threshold — the EXACT formulation.
    * This is a conditional cross product (O(n^2)): it exists as the small-n
    * reference/oracle mode only; every scale consumer routes through
    * [[cosineNearDupPairsLsh]] (bucketed, no all-pairs join anywhere). */
  def cosineNearDupPairsExact(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val n = withNorm(df, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm"))
    n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Multi-table random-hyperplane LSH signature column — `tables` longs,
    * one `bits`-bit signature each. Backed by the codegen'd
    * [[graft.functions.RhpSig]] expression (deterministic +-1 planes from
    * splitmix64; exactly reproducible by the DuckDB oracle via interpolated
    * sign literals). */
  def rhpSig(vec: Column, tables: Int, bits: Int): Column =
    call_function("graft_rhp_sig", vec, lit(tables), lit(bits))

  /** (id, tbl, sig) bucket rows: one row per (vector, hash table). Public:
    * feed these to [[Dedup.oversizedBuckets]] to audit RHP bucket skew. */
  def rhpBuckets(df: DataFrame, vecCol: String, idCol: String,
      tables: Int, bits: Int): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(rhpSig(col(vecCol), tables, bits)).as(Seq("tbl", "sig")))

  /** LSH-bucketed near-dup pairs: candidates must share a (table, signature)
    * bucket in at least one of the `tables` hash tables; survivors are
    * exactly verified (cosine >= threshold) WITHIN buckets only — no
    * all-pairs join anywhere. The candidate join carries only (id, tbl, sig);
    * vectors are joined back by id for the verify stage, so the shuffles are
    * O(n * tables) id-size rows plus O(candidates) vector lookups.
    *
    * Recall bound: a pair at cosine c shares one table's bucket with
    * probability (1 - arccos(c)/pi)^bits, so
    * recall(c) = 1 - (1 - (1 - arccos(c)/pi)^bits)^tables.
    * With the defaults (tables=32, bits=5) recall at c=0.4 is ~0.96
    * (measured 1.00 at sf0.01, 0.976 at sf0.1 on the test corpus); far
    * pairs rarely collide. At larger corpus sizes, grow `bits` ~ log2(n)
    * to keep per-bucket occupancy — and hence the verify cost — flat.
    *
    * Buckets over `maxBucketSize` members (an embedding-space boilerplate
    * cluster; a constant-vector corpus) are star-split instead of
    * self-joined — sub-quadratic by construction; see
    * [[Dedup.guardedBucketPairs]] for semantics and
    * [[Dedup.oversizedBuckets]] for the audit. */
  def cosineNearDupPairsLsh(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, tables: Int = 32, bits: Int = 5,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val n = withNorm(df, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm"))
    val sigs = rhpBuckets(df, vecCol, idCol, tables, bits)
    val candidates = Dedup.guardedBucketPairs(sigs, Seq("tbl", "sig"), "id",
      maxBucketSize)
    candidates
      .join(n.select(col("id").as("a_id"), col("v").as("va"), col("nrm").as("na")), "a_id")
      .join(n.select(col("id").as("b_id"), col("v").as("vb"), col("nrm").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** IVF-flat approximate top-k — the other standard ANN scale path next to
    * LSH: corpus vectors are assigned to their nearest coarse centroid in
    * ONE map-side pass (centroids broadcast), queries probe their `nprobe`
    * nearest centroids, and the exact cosine re-rank runs only inside the
    * probed inverted lists. Fully deterministic given the centroid set, so
    * the DuckDB oracle reproduces it exactly — centroids are data rows
    * (the `numCentroids` lowest-id vectors), recomputable oracle-side;
    * assignment ties break on centroid id. Centroid TRAINING (k-means) is
    * orthogonal: any fixed centroid set gives the same machinery, and a
    * trained one only improves recall.
    *
    * Scale shape: assignment is map-only; the candidate join is keyed by
    * centroid id (inverted lists), so cost ~ corpus/numCentroids * nprobe
    * per query instead of a full scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    // Centroids are MODEL STATE, not data: collect the tiny set driver-side
    // once and embed it as literals, so assignment is a pure per-row array
    // expression — zero shuffle, no window, the whole corpus pass stays
    // inside one codegen stage. (A window-based formulation would shuffle
    // every corpus vector by id just to rank 16 centroid sims.)
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(corpus.where(col(idCol) < numCentroids), vecCol)
        .select(col(idCol).cast("long"), col(vecCol), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
    ivfTopKWith(cents, corpus, queries, vecCol, idCol, k, nprobe)
  }

  /** [[ivfTopK]] over an EXPLICIT centroid set (e.g. from
    * [[trainCentroids]]) — the machinery is centroid-agnostic.
    * `broadcastProbes` fits the query-set shape: true (default) for the
    * serving case (small query set against a big corpus — probes ship to
    * every task); false for corpus-scale query sets (self-kNN audits),
    * where both sides shuffle by centroid id instead — the inverted-list
    * co-partitioned join. */
  def ivfTopKWith(cents: Seq[(Long, Seq[Float], Double)], corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String, k: Int,
      nprobe: Int, broadcastProbes: Boolean = true): DataFrame =
    ivfRank(ivfAssign(cents, corpus, vecCol, idCol, "nid", 1),
      ivfAssign(cents, queries, vecCol, idCol, "qid", nprobe),
      k, broadcastProbes)

  /** Centroid assignment as a pure per-row array expression — ONE
    * definition shared by the inline path and [[IndexStore]]'s persisted
    * path, so from-index answers are bit-identical by construction.
    * struct(csim, -cid): array_max / descending sort then break ties to
    * the LOWEST centroid id, matching the oracle's ORDER BY csim DESC,
    * cid. Output: (outId, v_outId, nrm_outId, cid) — `topn` rows per
    * input row (1 for inverted lists, nprobe for probes). */
  private[ext] def ivfAssign(cents: Seq[(Long, Seq[Float], Double)],
      df: DataFrame, vecCol: String, idCol: String, outId: String,
      topn: Int): DataFrame = {
    val centSims = array(cents.map { case (cid, cv, cnrm) =>
      struct((dot(col(vecCol), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("csim"),
        lit(-cid).as("negcid"))
    }: _*)
    withNorm(df, vecCol)
      .withColumn("probe",
        explode(slice(reverse(array_sort(centSims)), 1, topn)))
      .select(col(idCol).as(outId), col(vecCol).as(s"v_$outId"),
        col("nrm").as(s"nrm_$outId"), (-col("probe.negcid")).as("cid"))
  }

  /** The probe-join + re-rank half of IVF serving, over any inverted-
    * list frame shaped (cid, nid, v_nid, nrm_nid) — inline-built or read
    * back from a persisted index. Inverted lists PARTITION the corpus
    * (each vector lives in exactly one list) and a query's probes have
    * distinct cids, so (qid, nid) is already unique — no dedup needed;
    * the sim projects immediately so nothing after the broadcast join
    * carries vector payloads. */
  private[ext] def ivfRank(invertedLists: DataFrame, probes: DataFrame,
      k: Int, broadcastProbes: Boolean): DataFrame = {
    val probeSide = if (broadcastProbes) broadcast(probes) else probes
    val sims = invertedLists.join(probeSide, Seq("cid"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("v_qid"), col("v_nid")) / (col("nrm_qid") * col("nrm_nid"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }

  /** kNN label-noise audit (confident-learning's cheap cousin): for every
    * vector, the majority label among its k approximate nearest neighbors
    * vs its OWN label — disagreements are the mislabeled-example review
    * queue every labeled-dataset pipeline needs. Routed through the IVF
    * machinery (never a brute-force scan): candidates come from each
    * vector's `nprobe` nearest inverted lists with `broadcastProbes =
    * false` (corpus-scale query set — both sides shuffle by centroid id).
    * Fully deterministic: IVF assignment ties break to the lowest
    * centroid id, the top-k to the lowest neighbor id, and the vote to
    * the LOWEST label on count ties — so the oracle replicates every
    * decision. Output: (vec_id, label, knn_label, votes, agree). */
  def knnLabelAudit(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, k: Int = 5, numCentroids: Int = 16,
      nprobe: Int = 2): DataFrame = {
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(corpus.where(col(idCol) < numCentroids), vecCol)
        .select(col(idCol).cast("long"), col(vecCol), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
    val top = ivfTopKWith(cents, corpus, corpus, vecCol, idCol, k, nprobe,
      broadcastProbes = false)
    val labels = corpus.select(col(idCol).as("id"), col(labelCol).as("lab"))
    top
      .join(labels.select(col("id").as("qid"), col("lab").as("label")), "qid")
      .join(labels.select(col("id").as("nid"), col("lab").as("nlab")), "nid")
      .groupBy(col("qid"), col("label"), col("nlab"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("qid").as("vec_id"), col("label"))
      .agg(max_by(col("nlab"), struct(col("c"), -col("nlab"))).as("knn_label"),
        max(col("c")).as("votes"))
      .select(col("vec_id"), col("label"), col("knn_label"), col("votes"),
        (col("label") === col("knn_label")).as("agree"))
  }

  /** Cosine of every vector to the CORPUS CENTROID — the cheap
    * embedding-outlier signal (corrupt/degenerate embeddings point away
    * from the bulk). Per-dimension means accumulate in DECIMAL so the
    * centroid is identical under any partitioning/engine (a plain double
    * avg would be summation-order dependent — the dsum rule applied to
    * vectors); the centroid is then literal-embedded and the scan is
    * map-only. */
  /** Fixed-point quantum for the centroid accumulation: elements quantized
    * to a 2^-40 grid (~1e-12, below float precision) sum EXACTLY as longs —
    * decimal accumulation is not enough here because decimal->double
    * conversion rounds differently across engines (DuckDB scales int128 in
    * fp; the JVM rounds the exact value), and the centroid must be
    * bit-identical for the oracle. */
  private val CentroidQuantum = 1L << 40

  def centroidCosine(corpus: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val mu: Seq[Double] = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      // two-step division: count*quantum as a long product overflows past
      // 2^23 rows; double/long, then /quantum keeps both engines bit-equal
      .agg((sum(round(col("x").cast("double") * CentroidQuantum).cast("long"))
        .cast("double") / count(lit(1)) / lit(CentroidQuantum.toDouble)).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    require(mu.length == dim)
    val muNorm = math.sqrt(mu.foldLeft(0.0)((a, x) => a + x * x))
    val muF = typedLit(mu)
    withNorm(corpus, vecCol)
      .select(col(idCol),
        (dot(col(vecCol).cast("array<double>"), muF) / (col("nrm") * lit(muNorm)))
          .as("cos_centroid"))
  }

  /** Spherical k-means centroid training for IVF: Lloyd iterations with
    * cosine assignment and normalized per-dimension means. Every heavy step
    * is distributed — assignment is the same literal-centroid map-only
    * expression [[ivfTopKWith]] uses; re-estimation is one
    * posexplode + (cid, dim) aggregate whose output is k×d rows (tiny) —
    * the only driver traffic per iteration is the k×d means collect, i.e.
    * the model itself. Deterministic: init = lowest-id vectors, ties break
    * to the lowest centroid id, and means use Spark's fixed fp reduction
    * per (cid, dim) group (sum order can vary — training is model fitting,
    * not an oracle surface; SERVING with any fixed centroid set stays
    * bit-deterministic).
    *
    * Returns (cid, centroid, norm) ready for [[ivfTopKWith]]. Empty
    * clusters keep their previous centroid. */
  def trainCentroids(corpus: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, idCol: String = "vec_id"): Seq[(Long, Seq[Float], Double)] = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    // orderBy before limit: a bare limit(k) is partition-order dependent,
    // so the init (and the trained model) would vary across repartitionings
    var cents: Seq[(Long, Seq[Float], Double)] = withNorm(corpus, vecCol)
      .orderBy(col(idCol)).select(col(vecCol), col("nrm")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](0), r.getDouble(1)) }
    for (_ <- 1 to iters) {
      val centSims = array(cents.map { case (cid, cv, cnrm) =>
        struct((dot(col(vecCol), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("csim"),
          lit(-cid).as("negcid"))
      }: _*)
      val assigned = withNorm(corpus, vecCol)
        .withColumn("cid", -array_max(centSims).getField("negcid"))
      val means = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val v = new Array[Float](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
          cid -> v.toSeq
        }
      cents = cents.map { case (cid, oldV, oldN) =>
        means.get(cid) match {
          case Some(v) =>
            val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).max(1e-12)
            (cid, v, n)
          case None => (cid, oldV, oldN) // empty cluster: keep previous
        }
      }
    }
    cents
  }

  /** Average cosine of each corpus vector to its assigned centroid — the
    * spherical-k-means objective, for convergence monitoring/tests. */
  def assignmentQuality(corpus: DataFrame, vecCol: String,
      cents: Seq[(Long, Seq[Float], Double)]): Double = {
    val centSims = array(cents.map { case (_, cv, cnrm) =>
      dot(col(vecCol), typedLit(cv)) / (col("nrm") * lit(cnrm))
    }: _*)
    withNorm(corpus, vecCol)
      .select(array_max(centSims).as("best"))
      .agg(avg(col("best"))).head.getDouble(0)
  }

  /** SemDeDup — semantic deduplication via embedding clusters (the
    * pretraining-corpus recipe: cluster embeddings with k-means, then
    * drop near-duplicates WITHIN clusters only, so the pair scan never
    * crosses cluster boundaries). This composes the IVF machinery:
    * centroids are the same deterministic lowest-id set (swap in
    * [[trainCentroids]] output via [[semDeDupWith]] for trained ones),
    * assignment is the same literal-centroid map-only argmax.
    *
    * Dedup rule (declarative SemDeDup): x is REMOVED iff some same-cluster
    * y with cos(x,y) >= eps precedes it in keep order — keep order is
    * ascending (centroid cosine, id), i.e. the member FARTHEST from its
    * centroid survives its duplicate pair (SemDeDup's keep-the-outlier
    * choice, which preserves diversity; the id breaks exact ties). The
    * pairwise-dominance form replaces the paper's sequential greedy scan
    * with one cluster-keyed semi join — deterministic, order-free, and
    * slightly more aggressive (a chain a~b~c removes b and c even when
    * cos(a,c) < eps; for near-dup graphs at eps this is the standard
    * approximation — route through [[Dedup.connectedComponents]] when
    * exact component-level survivorship is required).
    *
    * Scale shape: assignment map-only (k×d literals); the dominance join
    * is an equi join ON cid — per-cluster work is bounded by cluster
    * size² in the worst case, the inherent SemDeDup cost (pick k ~ n/
    * target-cluster-size; audit skew with [[Dedup.oversizedBuckets]] on
    * the (cid, id) assignment). Output is one row per vector. */
  def semDeDup(corpus: DataFrame, vecCol: String, idCol: String,
      eps: Double, numCentroids: Int = 16): DataFrame = {
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(corpus.where(col(idCol) < numCentroids), vecCol)
        .select(col(idCol).cast("long"), col(vecCol), col("nrm"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
    semDeDupWith(cents, corpus, vecCol, idCol, eps)
  }

  /** [[semDeDup]] over an explicit centroid set. */
  def semDeDupWith(cents: Seq[(Long, Seq[Float], Double)], corpus: DataFrame,
      vecCol: String, idCol: String, eps: Double): DataFrame = {
    val centSims = array(cents.map { case (cid, cv, cnrm) =>
      struct((dot(col(vecCol), typedLit(cv)) / (col("nrm") * lit(cnrm))).as("csim"),
        lit(-cid).as("negcid"))
    }: _*)
    // pinned-cached: both dominance sides and the output join read it —
    // the k×d literal-centroid assignment pass should run once, not three
    // times (release via PinnedCache.releaseAll() in long-lived sessions)
    val assigned = PinnedCache.pin(withNorm(corpus, vecCol)
      .withColumn("best", array_max(centSims))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm"),
        (-col("best").getField("negcid")).as("cid"),
        col("best").getField("csim").as("ccos")))
    val x = assigned.select(col("id"), col("cid"), col("v"), col("nrm"), col("ccos"))
    val y = assigned.select(col("id").as("y_id"), col("cid").as("y_cid"),
      col("v").as("y_v"), col("nrm").as("y_nrm"), col("ccos").as("y_ccos"))
    val removed = x.join(y,
        col("cid") === col("y_cid") && col("id") =!= col("y_id") &&
          (col("y_ccos") < col("ccos") ||
            (col("y_ccos") === col("ccos") && col("y_id") < col("id"))) &&
          dot(col("v"), col("y_v")) / (col("nrm") * col("y_nrm")) >= eps,
        "left_semi")
      .select(col("id"))
    assigned
      .join(removed.select(col("id"), lit(true).as("_rm")).distinct(), Seq("id"), "left_outer")
      .select(col("id"), col("cid"), col("ccos"), col("_rm").isNull.as("kept"))
  }

  /** LSH-bucketed approximate top-k: candidates share a bucket in at least
    * one of the hash tables; exact cosine re-rank on the (deduplicated)
    * candidate set. Approximate by design — the scale path for ANN: bucket
    * join + per-bucket work instead of a corpus scan per query. Defaults
    * measured at recall@5 ~= 0.98 vs [[bruteForceTopK]] on the sf0.01
    * corpus (see RhpSigSpec). */
  def annTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, tables: Int = 32, bitsPerTable: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String) =
      withNorm(df, vecCol)
        .select(col(idCol).as(id), col(vecCol).as(s"v_$id"), col("nrm").as(s"nrm_$id"),
          posexplode(rhpSig(col(vecCol), tables, bitsPerTable)).as(Seq("tbl", "sig")))
    val c = bucketed(corpus, "nid")
    val q = bucketed(queries, "qid")
    val candidates = c.join(broadcast(q), Seq("tbl", "sig"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("v_qid"), col("v_nid"),
        col("nrm_qid"), col("nrm_nid"))
      .dropDuplicates("qid", "nid")
    val sims = candidates.select(col("qid"), col("nid"),
      (dot(col("v_qid"), col("v_nid")) / (col("nrm_qid") * col("nrm_nid"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }

  /** Multi-probe RHP-LSH top-k: each query probes its own bucket PLUS the
    * `nprobe − 1` neighbor buckets reached by flipping its lowest-|margin|
    * signature bits — the bits whose hyperplane the query sits closest to,
    * i.e. the buckets its true neighbors most likely fell into. The
    * standard memory trade: comparable recall to [[annTopK]] with FAR
    * fewer tables (probing is per-QUERY work; tables are per-CORPUS index
    * state — at 100 TB the corpus-side index dominates, so trading probe
    * fan-out for table count is the right direction).
    *
    * The corpus side is the unchanged codegen signature pass
    * ([[rhpBuckets]]); the query side recomputes its per-plane margins as
    * Column dot products against the SAME ±1 plane literals
    * ([[graft.functions.RhpSig.planeSign]]), so query bits (margin > 0)
    * agree with the codegen bits exactly, and the probe schedule
    * (|margin| asc, bit asc) is deterministic and oracle-replicable.
    * Queries broadcast; candidates are verified exactly within probed
    * buckets; no all-pairs join. */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, tables: Int = 4, bits: Int = 4,
      nprobe: Int = 4, dim: Int = 64): DataFrame = {
    require(nprobe >= 1 && nprobe <= bits + 1,
      "nprobe-1 single-bit flips need nprobe <= bits+1")
    // the query-side margin literals are length-`dim` plane vectors while
    // the corpus-side codegen signature reads the actual embedding length;
    // a mismatch would silently diverge the bits and collapse recall, so
    // check the first row of each side (one-row scalar probe each)
    for ((side, name) <- Seq((queries, "queries"), (corpus, "corpus")))
      side.select(size(col(vecCol))).head(1).foreach { r =>
        require(r.getInt(0) == dim,
          s"multiProbeTopK: $name.$vecCol has length ${r.getInt(0)} but dim=$dim")
      }
    import graft.functions.RhpSig.planeSign
    val powers = typedLit((0 until bits).map(1L << _))
    val qBase = withNorm(queries, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("v_q"), col("nrm").as("nrm_q"))
    val mCols = (0 until tables * bits).map { p =>
      dot(col("v_q"),
        typedLit((0 until dim).map(i => planeSign(p, i).toFloat))).as(s"m$p")
    }
    val withMargins = qBase.select(
      (Seq(col("qid"), col("v_q"), col("nrm_q")) ++ mCols): _*)
    val probeStructs = (0 until tables).flatMap { t =>
      val sig = (0 until bits).map(j =>
        when(col(s"m${t * bits + j}") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      val ranked = array_sort(array((0 until bits).map(j =>
        struct(abs(col(s"m${t * bits + j}")).as("am"), lit(j).as("j"))): _*))
      struct(lit(t).as("tbl"), sig.as("sig")) +:
        (1 until nprobe).map { p =>
          val flipBit = element_at(ranked, p).getField("j")
          struct(lit(t).as("tbl"),
            sig.bitwiseXOR(element_at(powers, flipBit + 1)).as("sig"))
        }
    }
    val qProbes = withMargins
      .select(col("qid"), col("v_q"), col("nrm_q"),
        explode(array(probeStructs: _*)).as("probe"))
      .select(col("qid"), col("v_q"), col("nrm_q"),
        col("probe.tbl").as("tbl"), col("probe.sig").as("sig"))
    val c = withNorm(corpus, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("v_n"), col("nrm").as("nrm_n"),
        posexplode(rhpSig(col(vecCol), tables, bits)).as(Seq("tbl", "sig")))
    val candidates = c.join(broadcast(qProbes), Seq("tbl", "sig"))
      .where(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
    val sims = candidates.select(col("qid"), col("nid"),
      (dot(col("v_q"), col("v_n")) / (col("nrm_q") * col("nrm_n"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }

  /** Retrieval-quality audit of an ANN configuration against exact ground
    * truth: per query, recall@k of the multi-probe result vs the brute
    * top-k, plus the rank the ANN list assigns the TRUE nearest neighbor
    * (reciprocal rank in integer ppm; 0 = missed). The eval harness an
    * index rollout gates on — approximate retrieval without a measured
    * recall/MRR is a silent-degradation risk at any scale.
    *
    * Runs the audit on a query SAMPLE (queries are the cheap side; the
    * brute-force ground truth is one broadcast-queries scan of the
    * corpus, affordable per audit). All ranking ties break on (sim desc,
    * nid) — both rankings deterministic, metrics pure integers. */
  def annQualityAudit(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, tables: Int = 4, bits: Int = 4,
      nprobe: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    val truth = PinnedCache.pin(
      bruteForceTopK(corpus, queries, vecCol, idCol, k)
        .withColumn("rk", row_number().over(w)))
    val ann = multiProbeTopK(corpus, queries, vecCol, idCol, k,
        tables, bits, nprobe)
      .withColumn("ark", row_number().over(w))
    val found = truth.join(ann.select(col("qid"), col("nid"), col("ark")),
        Seq("qid", "nid"), "left")
    found.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("ark").isNotNull, 1L).otherwise(0L)).as("n_found"),
        max(when(col("rk") === 1, coalesce(col("ark"), lit(0L)))).as("true1_rank"))
      .withColumn("recall_ppm", expr("(n_found * 1000000) div n_true"))
      .withColumn("rr_ppm",
        when(col("true1_rank") > 0, expr("1000000 div true1_rank"))
          .otherwise(lit(0L)))
  }

  /** Dominant principal direction of the embedding corpus (uncentered
    * Gram-matrix power iteration) + per-vector projections — the
    * drift-axis / spectral-outlier primitive (what "did the embedding
    * distribution move?" monitors project onto).
    *
    * Every step is INTEGER arithmetic so the whole computation is
    * bit-exact cross-engine (the q132 fixed-recurrence pattern at the
    * linear-algebra layer): embeddings quantize to a 2^10 grid
    * (floor(x*1024) — floor, not cast: cross-engine rounding), the d x d
    * Gram matrix accumulates as BIGINT sums, and `iters` power-iteration
    * steps renormalize by an arithmetic RIGHT SHIFT to ~2^20 (shift =
    * floor-division-by-2^k in Spark AND DuckDB, where `div`-vs-`//`
    * semantics on negatives would diverge). The Gram matrix is PSD, so
    * the iteration converges monotonically toward the top eigenvector;
    * the OPERATOR's contract is the exact result of `iters` steps from
    * v0 = (1024,...) — deterministic, not "the eigenvector".
    *
    * Scale shape: the Gram cells are ONE map-side-combinable aggregate
    * over d^2 keys (d=64 -> 4096 cells — bounded state, the q110 grid
    * argument); the iteration runs driver-side on the collected cells
    * (d x d MODEL STATE, like k-means centroids); projections are one
    * map-only pass with the eigenvector as a literal. Overflow bound:
    * cell <= rows * (2^13)^2 — safe to ~2^36 rows at |x|<=8, then raise
    * the shift or switch cells to decimal(38). */
  def topPcProjections(df: DataFrame, vecCol: String, idCol: String,
      dims: Int, iters: Int = 6): DataFrame = {
    val v = topPcVector(df, vecCol, dims, iters)
    val vLit = array(v.map(lit): _*)
    df.select(col(idCol).as("vec_id"),
        expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1024.0) as bigint))")
          .as("q"))
      .withColumn("vv", vLit)
      .select(col("vec_id"),
        expr("aggregate(zip_with(q, vv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("proj"))
  }

  /** The shift-normalized integer power iteration itself (driver-side on
    * the collected Gram cells — see [[topPcProjections]]). */
  def topPcVector(df: DataFrame, vecCol: String, dims: Int, iters: Int): Array[Long] = {
    val cells = gramCells(df, vecCol)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val c = Array.tabulate(dims, dims)((i, j) => cells.getOrElse((i + 1, j + 1), 0L))
    var v = Array.fill(dims)(1024L)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dims) { i =>
        var s = 0L
        var j = 0
        while (j < dims) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      val maxAbs = w.iterator.map(math.abs).max
      val binLen = if (maxAbs == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(maxAbs)
      val k = math.max(binLen - 20, 0)
      v = w.map(_ >> k)
    }
    v
  }

  /** BIGINT Gram cells of the 2^10-quantized embeddings: `(i, j, c)`,
    * 1-based dims, one partial-agg'd aggregate over d^2 keys. */
  def gramCells(df: DataFrame, vecCol: String): DataFrame =
    df.select(expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1024.0) as bigint))")
        .as("q"))
      .select(posexplode(col("q")).as(Seq("i0", "qi")), col("q"))
      .select(col("i0"), col("qi"), posexplode(col("q")).as(Seq("j0", "qj")))
      .groupBy((col("i0") + 1).as("i"), (col("j0") + 1).as("j"))
      .agg(sum(col("qi") * col("qj")).as("c"))

  /** DBSCAN-style density clustering over an embedding column — the
    * topic/near-dup GROUPING operator where the pairwise threshold alone
    * is too weak (q41/q42 drop pairs; this finds dense regions and labels
    * every vector): a vector with >= `minPts` neighbors at cosine >= `eps`
    * is CORE; clusters are connected components over core-core edges;
    * non-core vectors adjacent to a core are BORDER (assigned the MIN
    * root among their core neighbors — the deterministic tie rule);
    * everything else is NOISE (Ester et al. 1996, DBSCAN). `minPts`
    * counts NEIGHBORS (not the point itself).
    *
    * Scale shape: the neighbor graph comes from the guarded RHP bucket
    * join (never all-pairs); degrees/roles are one partial-agg'd count;
    * components run on the CORE subgraph only (dense regions — the small
    * side); border attachment is one edge-keyed join + min. The epsilon
    * graph is LSH-approximate with the usual recall bound; the oracle
    * replicates the bucketed semantics exactly. */
  def dbscanClusters(df: DataFrame, vecCol: String, idCol: String, eps: Double,
      minPts: Int, tables: Int = 32, bits: Int = 5): DataFrame = {
    // pinned: the LSH-verify pair pipeline feeds the degree count, the
    // core-edge join, and the border attach — cache it rather than run it
    // three times (the dominant sf0.1 cost remains the dense epsilon
    // graph itself: pair volume grows ~quadratically in corpus density
    // at a loose eps, which is inherent to DBSCAN's neighborhood graph)
    val pairs = PinnedCache.pin(
      cosineNearDupPairsLsh(df, vecCol, idCol, eps, tables, bits)
        .select(col("a_id"), col("b_id")))
    val sym = pairs.unionByName(
      pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val core = PinnedCache.pin(
      sym.groupBy(col("a_id").as("id")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= minPts).select(col("id")))
    val coreEdges = sym
      .join(core.withColumnRenamed("id", "a_id"), "a_id")
      .join(core.withColumnRenamed("id", "b_id"), "b_id")
    val cc = graft.ext.Dedup.connectedComponents(coreEdges)
    // cores isolated from other cores still head their own 1-core cluster
    val coreRoot = core.join(cc, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("root"), col("id")).as("root"))
    val borderRoot = sym
      .join(core.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_anti")
      .join(coreRoot.select(col("id").as("b_id"), col("root")), "b_id")
      .groupBy(col("a_id").as("id")).agg(min(col("root")).as("root"))
    df.select(col(idCol).as("vec_id"))
      .join(coreRoot.select(col("id").as("vec_id"), col("root").as("c_root")),
        Seq("vec_id"), "left_outer")
      .join(borderRoot.select(col("id").as("vec_id"), col("root").as("b_root")),
        Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        when(col("c_root").isNotNull, "core")
          .when(col("b_root").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("c_root"), col("b_root")).as("root"))
  }

  /** SEMANTIC eval-set decontamination — the embedding-space sibling of the
    * n-gram overlap probe (q125): flag every corpus vector whose cosine to
    * ANY benchmark/eval vector reaches `threshold`, with the evidence
    * (candidate count, match count, best-matching eval item). Paraphrased
    * leakage has no shared n-grams; this is the screen that catches it.
    *
    * Scale shape — the q109 asymmetric-probe rule applied to embeddings:
    * the eval set is tiny MODEL-SIDE state (its signature rows broadcast);
    * corpus signatures are map-only codegen; the candidate join is keyed
    * by (table, signature) so cost is corpus x collision rate, never
    * corpus^2 and never eval x corpus. The per-corpus-vector window ranks
    * only that vector's candidates (bounded by the collision count).
    * Approximate by the RHP recall bound (see [[cosineNearDupPairsLsh]]);
    * the oracle replicates the BUCKETED semantics bit-for-bit. */
  def semanticContamination(corpus: DataFrame, evalSet: DataFrame, vecCol: String,
      idCol: String, threshold: Double, tables: Int = 32, bits: Int = 5): DataFrame = {
    val cand = rhpBuckets(corpus, vecCol, idCol, tables, bits)
      .withColumnRenamed("id", "a_id")
      .join(broadcast(rhpBuckets(evalSet, vecCol, idCol, tables, bits)
        .withColumnRenamed("id", "b_id")), Seq("tbl", "sig"))
      .select(col("a_id"), col("b_id")).dropDuplicates("a_id", "b_id")
    val cn = withNorm(corpus, vecCol)
      .select(col(idCol).as("a_id"), col(vecCol).as("va"), col("nrm").as("na"))
    val en = withNorm(evalSet, vecCol)
      .select(col(idCol).as("b_id"), col(vecCol).as("vb"), col("nrm").as("nb"))
    val sims = cand.join(cn, "a_id").join(broadcast(en), "b_id")
      .select(col("a_id"), col("b_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
    val agg = sims.groupBy(col("a_id")).agg(
      count(lit(1)).as("n_cand"),
      sum(when(col("cos_sim") >= threshold, 1L).otherwise(0L)).as("n_match"),
      max(col("cos_sim")).as("max_cos"))
    val w = Window.partitionBy(col("a_id")).orderBy(col("cos_sim").desc, col("b_id"))
    val best = sims.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("a_id"), col("b_id").as("best_eval"))
    corpus.select(col(idCol).as("vec_id"))
      .join(agg.withColumnRenamed("a_id", "vec_id"), Seq("vec_id"), "left_outer")
      .join(best.withColumnRenamed("a_id", "vec_id"), Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        col("max_cos"), col("best_eval"),
        (coalesce(col("n_match"), lit(0L)) > 0).as("contaminated"))
  }
}
