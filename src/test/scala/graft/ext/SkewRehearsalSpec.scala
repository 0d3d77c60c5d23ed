package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.audit.TaskBudgetListener
import graft.tables.TableOps

/** Skew REHEARSAL — the stress axis SCALE.md's p256/2g sweep doesn't
  * cover: the operator families that shuffle by a data key (last-by,
  * equi join, connected components, LSH bucketing) run here against
  * deterministic Zipf(2) input where ONE key holds ~50 % of all rows,
  * with listener-asserted budgets (real TaskMetrics, the ScaleBudgetSpec
  * discipline) proving either structural immunity (map-side partials) or
  * that the salted/guarded path beats the naive one. The
  * `maxTaskShuffleShare` metric is the straggler signal: balanced ≈
  * 1/partitions, hot-key ≈ the hot key's row share.
  *
  * Scenario sizes are test-scale (2–4 M rows) but the ASSERTIONS are on
  * ratios and structural bounds, which is what transfers to 1000
  * executors: a stage whose hungriest task reads 51 % of the shuffle is
  * a one-straggler stage at ANY scale. */
class SkewRehearsalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val MB = 1048576L

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** count + order-free content checksum — cheap whole-result equality. */
  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.select(
      count(lit(1)).as("n"),
      coalesce(sum(hash(df.columns.map(col).toIndexedSeq: _*).cast("long")), lit(0L))
        .as("h")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("last-by family under Zipf(2): all three paths identical, shuffle stays partial-bounded, no spill") {
    // key 1 holds ~1M of the 2M rows. An implementation that shuffled raw
    // rows would move ~45 MB and put half of it in one task; max_by
    // partials (plain + salted) and Spark 4's WindowGroupLimit pushdown
    // (window path) each reduce map-side to ~keys-cardinality rows.
    val zf = Skew.zipfFrame(spark, 2000000L, 10000)
    val ord = Seq("payload", "id")
    val plainCk = checksum(TableOps.lastByKeys(zf, Seq("key"), ord))
    // Zipf(2)'s tail is so heavy that 2M draws realize ~1.8k of the 10k
    // key slots — plenty of reduce keys, one dominant one (the scenario)
    assert(plainCk._1 > 1500, s"degenerate key space: ${plainCk._1} keys")
    val (saltedCk, bs) = TaskBudgetListener.measure(spark) {
      checksum(TableOps.lastByKeysSalted(zf, Seq("key"), ord, 16))
    }
    info(s"salted: ${bs.pretty}")
    val (windowCk, bw) = TaskBudgetListener.measure(spark) {
      checksum(TableOps.lastByKeysWindow(zf, Seq("key"), ord))
    }
    info(s"window: ${bw.pretty}")
    assert(saltedCk == plainCk, "salted last-by must equal the unsalted aggregate")
    assert(windowCk == plainCk, "window last-by must equal the aggregate")
    for ((name, b) <- Seq("salted" -> bs, "window" -> bw)) {
      assert(b.shuffleWriteBytes < 4 * MB,
        s"$name shuffled raw rows under skew: shufW=${b.shuffleWriteBytes}")
      assert(b.memorySpillBytes == 0 && b.diskSpillBytes == 0, s"$name spilled")
    }
    // the window path's immunity rests on the WindowGroupLimit rewrite —
    // guard it, because losing it silently re-creates the hot-key task
    val plan = TableOps.lastByKeysWindow(zf, Seq("key"), ord)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank-1 filter no longer pushes below the window shuffle")
  }

  test("salted skew join beats the naive shuffle join on straggler share AND per-task memory") {
    // 4M-row Zipf(2) fact (hot key ~2M rows) joined to a 20k-row dim that
    // is too big to broadcast in this scenario (broadcast disabled to
    // model the big-dim case; AQE off so the naive plan is the honest
    // pre-AQE baseline the explicit rewrite competes with).
    val dim = spark.range(1, 20001).select(col("id").as("key"),
      pmod(xxhash64(col("id"), lit(3L)), lit(1000L)).as("dpay"))
    val fact = Skew.zipfFrame(spark, 4000000L, 20000)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // audit sizes the rewrite: keys over 5% of rows, split to <=256k rows
      val hot = Skew.skewAudit(fact, "key", 256 * 1024, 50000)
        .select("key").collect().map(_.getLong(0)).toSeq.sorted
      assert(hot.take(3) == Seq(1L, 2L, 3L), s"audit missed the Zipf head: $hot")
      val (plainCk, bp) = TaskBudgetListener.measure(spark) {
        checksum(fact.join(dim, "key"))
      }
      info(s"plain:  ${bp.pretty}")
      val (saltCk, bsj) = TaskBudgetListener.measure(spark) {
        checksum(Skew.saltedSkewJoin(fact, dim, "key", hot, 16))
      }
      info(s"salted: ${bsj.pretty}")
      assert(saltCk == plainCk, "salted join must be row-identical to the plain join")
      // measured (round 7): plain share 0.51 / peak 320 MB; salted share
      // 0.22 / peak 160 MB — asserted with margin on both sides
      assert(bp.maxTaskShuffleShare > 0.35,
        f"scenario lost its skew: plain straggler share ${bp.maxTaskShuffleShare}%.2f")
      assert(bsj.maxTaskShuffleShare < 0.30,
        f"salting no longer spreads the hot key: ${bsj.maxTaskShuffleShare}%.2f")
      assert(bsj.peakExecMem < bp.peakExecMem,
        s"salted per-task peak ${bsj.peakExecMem} must beat plain ${bp.peakExecMem}")
      assert(bsj.memorySpillBytes == 0 && bsj.diskSpillBytes == 0, "salted path spilled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevPart)
    }
  }

  test("connected components on a hub graph: bounded shuffle, zero spill, one component") {
    // the dup-graph worst case: one hub node adjacent to 100k spokes —
    // the star-contraction rounds key everything by the hub
    val hub = spark.range(1, 100001).select(lit(0L).as("a_id"), col("id").as("b_id"))
    val ((roots, nRows), b) = TaskBudgetListener.measure(spark) {
      val cc = Dedup.connectedComponents(hub)
      val r = cc.agg(countDistinct(col("root")), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    info(s"cc hub: ${b.pretty}")
    assert(roots == 1L && nRows == 100001L)
    // measured 4 MB shufW / 75 MB peak / 0 spill at round 7 — 4x ceilings
    assert(b.shuffleWriteBytes < 16 * MB,
      s"hub CC shuffle blew up: shufW=${b.shuffleWriteBytes}")
    assert(b.diskSpillBytes == 0, "hub CC spilled to disk")
  }

  test("walk operators under hub-degree skew: first-order immune, node2vec bounded per walk-visit") {
    // Zipf-extreme rehearsal for the walk generators (round-12 item):
    // one hub of degree 20k, spokes of degree 1 — every walk's first
    // hop lands ON the hub, the worst case for both operators at once.
    // randomWalks (two-equi-join hop, the r12 reshape): the hop probe
    // carries |walks| rows and the hub's degree row is ONE broadcastable
    // row — deg(hub) NEVER materializes, so the shuffle is walk-count
    // sized regardless of hub degree (structural immunity).
    // node2vecWalks: the second-order bias needs the full neighbor
    // fan-out, so a walk AT the hub costs deg(hub) candidate rows — the
    // inherent footprint — but candidates shard by (origin, walk): the
    // per-task bound is deg(hub) rows PER WALK-VISIT (not walks×deg in
    // one task), which is what keeps the 1000-executor straggler story
    // bounded: one window partition per walk, each ≤ deg(hub).
    val spokes = 20000L
    val hubEdges = spark.range(1, spokes + 1)
      .select(lit(0L).cast("string").as("src"), col("id").cast("string").as("dst"))
    val edges = hubEdges.unionByName(
      hubEdges.select(col("dst").as("src"), col("src").as("dst")))
    val origins = spark.range(1, 33).select(col("id").cast("string").as("origin"))

    val (rwCount, brw) = TaskBudgetListener.measure(spark) {
      Graphs.randomWalks(edges, origins, walksPerNode = 2, steps = 3).count()
    }
    info(s"randomWalks hub: ${brw.pretty}")
    // 32 origins x 2 walks x 4 steps (incl. step 0), all full length
    assert(rwCount == 32L * 2L * 4L, s"walk corpus wrong size: $rwCount")
    // adjacency indexing shuffles the 40k-edge graph once (~sub-MB);
    // per-hop state is 64 walk rows — a deg-fanout regression would read
    // walks x 20k rows through the exchanges instead
    assert(brw.shuffleWriteBytes < 8 * MB,
      s"first-order hop fanned out by hub degree: shufW=${brw.shuffleWriteBytes}")
    assert(brw.memorySpillBytes == 0 && brw.diskSpillBytes == 0, "randomWalks spilled")

    val (nvCount, bnv) = TaskBudgetListener.measure(spark) {
      Graphs.node2vecWalks(edges, origins, walksPerNode = 2, steps = 3,
        retW = 250, comW = 1000, outW = 500).count()
    }
    info(s"node2vec hub:   ${bnv.pretty}")
    assert(nvCount == 32L * 2L * 4L, s"node2vec corpus wrong size: $nvCount")
    // the hub visit costs 64 walks x 20k candidates ≈ 1.3M rows through
    // the cumulative windows — the documented second-order footprint;
    // the assertion is on the SHARDING: no single task may concentrate
    // the whole fan-out (walks spread across window partitions), and
    // nothing spills
    assert(bnv.maxTaskShuffleShare < 0.35,
      f"hub fan-out concentrated in one task: ${bnv.maxTaskShuffleShare}%.2f")
    assert(bnv.memorySpillBytes == 0 && bnv.diskSpillBytes == 0, "node2vec spilled")
    // and the footprint ratio documents WHY node2vec costs more under
    // hubs: second-order moves >= 5x the first-order bytes here
    assert(bnv.shuffleWriteBytes > brw.shuffleWriteBytes,
      "scenario lost its point: node2vec should pay the fan-out randomWalks avoids")
  }

  test("capAdjacency flattens node2vec's hub fan-out (the SCALE.md pre-step)") {
    // the promised opt-in pre-step: cap the hub's adjacency BEFORE
    // walking. Per walk-visit the candidate list is then <= maxDeg
    // instead of deg(hub), so growing the hub 4x moves the walk's
    // shuffle only by the linear edge-list scan (the cap output still
    // carries one row per spoke), never by walks x deg(hub) candidates.
    def hubGraph(spokes: Long): DataFrame = {
      val h = spark.range(1, spokes + 1)
        .select(lit(0L).cast("string").as("src"), col("id").cast("string").as("dst"))
      h.unionByName(h.select(col("dst").as("src"), col("src").as("dst")))
    }
    val origins = spark.range(1, 33).select(col("id").cast("string").as("origin"))
    def walkBytes(spokes: Long, maxDeg: Option[Int]): Long = {
      val g = maxDeg.map(Graphs.capAdjacency(hubGraph(spokes), _))
        .getOrElse(hubGraph(spokes))
        .localCheckpoint(true) // measure the WALK, not the cap/build
      val (n, b) = TaskBudgetListener.measure(spark) {
        Graphs.node2vecWalks(g, origins, walksPerNode = 2, steps = 3,
          retW = 250, comW = 1000, outW = 500).count()
      }
      // every node keeps out-degree >= 1 under the cap (spokes have one
      // edge; the hub keeps maxDeg), so all walks still run full length
      assert(n == 32L * 2L * 4L, s"corpus wrong size at $spokes/$maxDeg: $n")
      b.shuffleWriteBytes
    }
    val u20 = walkBytes(20000, None)
    val c20 = walkBytes(20000, Some(64))
    val c5 = walkBytes(5000, Some(64))
    info(s"node2vec shufW: uncapped20k=$u20 capped20k=$c20 capped5k=$c5")
    // the cap removes the deg(hub) candidate fan-out outright...
    assert(c20 * 3 < u20,
      s"cap did not flatten the fan-out: capped=$c20 uncapped=$u20")
    // ...and what remains grows sub-linearly in hub degree (4x hub,
    // < 3x bytes — the residual is the edge-list scan, not the fan-out)
    assert(c20 < c5 * 3, s"capped walk still tracks hub degree: $c5 -> $c20")
  }

  test("guarded bucket pairs star-split an oversized (boilerplate) bucket instead of going quadratic") {
    // one 3000-member bucket + 50 small ones; unguarded within-bucket
    // pairing would emit 3000*2999/2 ≈ 4.5M candidates from the hot
    // bucket alone — the guard caps it at m-1 hub pairs
    val big = spark.range(0, 3000).select(lit(0L).as("bk"), col("id").as("id"))
    val small = spark.range(0, 500)
      .select((col("id") % 50 + 1).as("bk"), (col("id") + 10000).as("id"))
    val buckets = big.unionByName(small)
    val (cnt, b) = TaskBudgetListener.measure(spark) {
      Dedup.guardedBucketPairs(buckets, Seq("bk"), "id", maxBucketSize = 256)
        .count()
    }
    info(s"guarded pairs: ${b.pretty}")
    val smallPairs = 50L * (10L * 9L / 2L) // 50 buckets x C(10,2)
    assert(cnt == 2999L + smallPairs,
      s"expected hub pairs + small-bucket pairs, got $cnt")
    assert(b.shuffleWriteBytes < 8 * MB,
      s"guarded pairing shuffled quadratically: shufW=${b.shuffleWriteBytes}")
    assert(b.diskSpillBytes == 0, "guarded pairing spilled")
  }
}
