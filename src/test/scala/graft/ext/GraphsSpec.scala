package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer PageRank vs an independent in-memory replay of the exact same
  * recurrence — any divergence means the distributed plan broke the
  * floor-division arithmetic or dropped a node. */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(sym: Seq[(Long, Long)], iters: Int, mass: Long): Map[Long, Long] = {
    val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size
    val r0 = mass / n
    val base = (15L * r0) / 100L
    var ranks = deg.keys.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2)
      ranks = in.map { case (v, es) =>
        v -> (base + (85L * es.map { case (u, _) => ranks(u) / deg(u) }.sum) / 100L)
      }
    }
    ranks
  }

  private def run(sym: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.integerPageRank(sym.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random symmetric graph matches the in-memory recurrence exactly") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val sym = (edges ++ edges.map(_.swap)).distinct
    for (iters <- Seq(1, 3, 5)) assert(run(sym, iters) == brute(sym, iters, 1000000000000L), s"iters=$iters")
  }

  test("hub of a star graph outranks leaves; floor leak stays below N ulps per round") {
    val leaves = (1L to 20L)
    val sym = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val got = run(sym, 4)
    assert(leaves.forall(l => got(0L) > got(l)), "hub must outrank every leaf")
    val mass = 1000000000000L
    assert(got.values.sum <= mass && got.values.sum > mass * 9 / 10,
      "total mass conserved up to floor leakage")
  }

  // --- triangleCounts: oriented enumeration vs brute-force triple scan ---

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val triPerNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a) if c > b && adj(b).contains(c)
    } { triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1 }
    nodes.map(n => n -> (adj(n).size.toLong, triPerNode(n))).toMap
  }

  test("triangleCounts matches brute force on a random graph, incl. lcc_ppm") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 < e._2).distinct
    val got = Graphs.triangleCounts(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = bruteTriangles(edges)
    assert(got.keySet == want.keySet, "node sets differ")
    for ((n, (deg, tri)) <- want) {
      val (gd, gt, glcc) = got(n)
      assert(gd == deg, s"deg($n)")
      assert(gt == tri, s"tri($n)")
      val wantLcc = if (deg >= 2) (tri * 2000000L) / (deg * (deg - 1)) else 0L
      assert(glcc == wantLcc, s"lcc_ppm($n)")
    }
  }

  test("kCorePeel matches an in-memory peel; cliques survive, tendrils die") {
    def brutePeel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
      var e = edges
      for (_ <- 1 to rounds) {
        val deg = (e ++ e.map(_.swap)).groupBy(_._1).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        e = e.filter(x => keep(x._1) && keep(x._2))
      }
      (e ++ e.map(_.swap)).groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    }
    val rnd = new scala.util.Random(11)
    val edges = (Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 < e._2) ++
      // a K6 on 100..105 hanging off a degree-1 tendril 106-107-108
      (for { i <- 100L to 105L; j <- (i + 1) to 105L } yield (i, j)) ++
      Seq((105L, 106L), (106L, 107L), (107L, 108L))).distinct
    for (k <- Seq(3, 5); rounds <- Seq(1, 3)) {
      val got = Graphs.kCorePeel(edges.toDF("a", "b"), k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brutePeel(edges, k, rounds), s"k=$k rounds=$rounds")
    }
    val core5 = Graphs.kCorePeel(edges.toDF("a", "b"), 5, 4)
      .collect().map(_.getLong(0)).toSet
    assert((100L to 105L).forall(core5), "the K6 must survive any 5-core peel")
    assert(Seq(106L, 107L, 108L).forall(!core5.contains(_)), "tendril peeled")
  }

  test("k=2 pre-peel is invisible in the output: peelRounds 0 == 2 on a tendril-heavy graph") {
    // a random core plus long degree-1 chains hanging off it — exactly the
    // shape the pre-peel sheds; counts, degrees, and lcc must not move
    val rnd = new scala.util.Random(13)
    val core = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 < e._2).distinct
    val chains = (0 until 5).flatMap { c =>
      val base = 100L + c * 10
      (0 until 4).map(i => (base + i, base + i + 1)) :+ (c.toLong, base)
    }
    val edges = (core ++ chains).distinct
    def rows(pr: Int) = Graphs.triangleCounts(edges.toDF("a", "b"), peelRounds = pr)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(2) == rows(0), "pre-peel changed the result")
    // chain interiors are present with their original degree and tri = 0
    val got = rows(2).map(t => t._1 -> t).toMap
    assert(got(102L) == ((102L, 2L, 0L, 0L)), "peeled chain node must keep deg, tri=0")
  }

  test("triangleCounts: triangle-free and complete graphs hit the lcc bounds") {
    // 4-cycle: 0 triangles everywhere
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    val c = Graphs.triangleCounts(cyc.toDF("a", "b")).collect()
    assert(c.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    // K5: every node in C(4,2)=6 triangles, lcc exactly 1.0 (10^6 ppm)
    val k5 = for { i <- 0L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val k = Graphs.triangleCounts(k5.toDF("a", "b")).collect()
    assert(k.forall(r => r.getLong(1) == 4L && r.getLong(2) == 6L && r.getLong(3) == 1000000L))
  }

  test("integerHits matches the in-memory recurrence; hubs/auths land on the right sides") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(180)((rnd.nextInt(20).toLong, 100L + rnd.nextInt(15))).distinct
    val scale = 1000000L
    // in-memory replay of the max-rescaled half-steps
    var hub = edges.map(_._1).distinct.map(_ -> scale).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val a0 = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub(e._1)).sum }
      val amx = a0.values.max
      auth = a0.map { case (d, a) => d -> (a * scale) / amx }
      val h0 = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => auth(e._2)).sum }
      val hmx = h0.values.max
      hub = h0.map { case (s, h) => s -> (h * scale) / hmx }
    }
    val got = Graphs.integerHits(edges.toDF("src", "dst"), iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (hub.keySet ++ auth.keySet).map(n =>
      n -> ((hub.getOrElse(n, 0L), auth.getOrElse(n, 0L)))).toMap
    assert(got == want)
    // bipartite fixture: sources are pure hubs, targets pure authorities
    assert(got.filter(_._1 < 100L).forall { case (_, (h, a)) => h > 0 && a == 0 })
    assert(got.filter(_._1 >= 100L).forall { case (_, (h, a)) => h == 0 && a > 0 })
  }

  test("bfsDistances: exact min-hop distances vs in-memory BFS; hop bound respected") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val sym = (edges ++ edges.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val seeds = Seq(0L, 1L)
    // in-memory BFS, capped at 4 hops
    var dist = seeds.map(_ -> 0L).toMap
    for (r <- 1 to 4) {
      val frontier = dist.filter(_._2 == r - 1).keys
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil)).filterNot(dist.contains)
      dist = dist ++ next.map(_ -> r.toLong)
    }
    val got = Graphs.bfsDistances(sym.toDF("src", "dst"), seeds.toDF("node"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
  }

  test("bfsDistances: disconnected nodes absent; seed distance is 0 even with incoming edges") {
    val sym = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L), (5L, 0L), (0L, 5L))
    val got = Graphs.bfsDistances(sym.toDF("src", "dst"), Seq(0L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 5L -> 1L), "component {2,3} must be absent")
  }

  test("personalizedPageRank matches the in-memory recurrence exactly") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(250)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      .filter(e => e._1 != e._2).distinct
    val sym = (edges ++ edges.map(_.swap)).distinct
    val seeds = Seq(3L, 4L, 5L)
    val mass = 1000000000000L
    val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val r0 = mass / seeds.size
    val tel = (15L * r0) / 100L
    var ranks = seeds.map(_ -> r0).toMap
    for (iters <- Seq(1, 3, 5)) {
      ranks = seeds.map(_ -> r0).toMap
      for (_ <- 1 to iters) {
        val in = sym.groupBy(_._2)
        val contrib = in.map { case (v, es) =>
          v -> (85L * es.map { case (u, _) =>
            ranks.getOrElse(u, 0L) / deg(u) }.sum) / 100L
        }
        ranks = (contrib.keySet ++ seeds)
          .map(v => v -> (contrib.getOrElse(v, 0L) +
            (if (seeds.contains(v)) tel else 0L)))
          .filter(_._2 > 0).toMap
      }
      val got = Graphs.personalizedPageRank(
          sym.toDF("src", "dst"), seeds.toDF("node"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ranks, s"iters=$iters")
    }
  }

  test("personalizedPageRank: mass decays with distance from the seed") {
    // path 0-1-2-3-4-5, seed at 0. A path is BIPARTITE, so a fixed
    // iteration count oscillates between parity layers (the seed's whole
    // mass flows to its only neighbor each round) — per-node monotonicity
    // does NOT hold. Summing adjacent distance pairs cancels the parity:
    // mass near the seed must strictly dominate each farther pair.
    val path = (0L to 4L).map(i => (i, i + 1))
    val sym = (path ++ path.map(_.swap)).distinct
    val got = Graphs.personalizedPageRank(sym.toDF("src", "dst"),
        Seq(0L).toDF("node"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pair(a: Long, b: Long) = got.getOrElse(a, 0L) + got.getOrElse(b, 0L)
    assert(pair(0L, 1L) > pair(2L, 3L) && pair(2L, 3L) > pair(4L, 5L))
  }
}
