package graft.ext

import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.edgeBetweenness]] — per-LINK Brandes (the Girvan–Newman
  * splitting signal). Pins the hand-derivable path and diamond cases,
  * the bridge dominating two communities, an independent in-memory
  * edge-Brandes twin on random digraphs, and the cross-consistency
  * invariant with the NODE operator: a non-seed node's outgoing edge
  * values sum to exactly its node dependency. */
class EdgeBetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 1000000L

  private def got(edges: Seq[(Long, Long)], seeds: Seq[Long], rounds: Int)
      : Map[(Long, Long), (Long, Long)] =
    Graphs.edgeBetweenness(edges.toDF("src", "dst"), seeds.toDF("seed"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  /** independent twin: per-seed BFS path counts + the identical per-edge
    * floor-div term ladder, including level-0 source edges */
  private def brute(edges: Seq[(Long, Long)], seeds: Seq[Long], rounds: Int)
      : Map[(Long, Long), (Long, Long)] = {
    val adj = edges.distinct.groupMap(_._1)(_._2)
    val ebc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val through = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (s <- seeds.distinct) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      val byLevel = scala.collection.mutable.Map(0 -> Seq(s))
      for (r <- 1 to rounds) {
        val cand = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj.getOrElse(v, Nil) if !dist.contains(w))
          cand(w) = cand.getOrElse(w, 0L) + sigma(v)
        frontier = cand.keys.toSeq.sorted
        dist ++= frontier.map(_ -> r)
        sigma ++= cand
        byLevel(r) = frontier
      }
      val dd = scala.collection.mutable.Map.empty[Long, Long]
      for (r <- (rounds - 1) to 0 by -1; v <- byLevel.getOrElse(r, Nil)) {
        val terms = adj.getOrElse(v, Nil)
          .filter(w => dist.get(w).contains(r + 1))
          .map(w => w -> (sigma(v) * (S + dd.getOrElse(w, 0L))) / sigma(w))
        terms.foreach { case (w, t) =>
          ebc((v, w)) = ebc.getOrElse((v, w), 0L) + t
          if (t > 0L) through((v, w)) = through.getOrElse((v, w), 0L) + 1L
        }
        if (r >= 1) dd(v) = terms.map(_._2).sum
      }
    }
    ebc.map { case (e, v) => e -> ((v, through.getOrElse(e, 0L))) }.toMap
  }

  test("path s->a->b: the first edge carries both pairs") {
    val edges = Seq((0L, 1L), (1L, 2L))
    val r = got(edges, Seq(0L), 2)
    assert(r == Map((0L, 1L) -> ((2L * S, 1L)), (1L, 2L) -> ((S, 1L))))
  }

  test("diamond: branch edges carry 1.5e6, closing edges 0.5e6 (floor-exact)") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val r = got(edges, Seq(0L), 2)
    assert(r == Map(
      (0L, 1L) -> ((S + S / 2, 1L)), (0L, 2L) -> ((S + S / 2, 1L)),
      (1L, 3L) -> ((S / 2, 1L)), (2L, 3L) -> ((S / 2, 1L))))
  }

  test("a bridge between two cliques dominates every intra-clique edge") {
    val a = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 2L), (2L, 1L))
    val b = Seq((10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L), (11L, 12L), (12L, 11L))
    val bridge = Seq((2L, 10L), (10L, 2L))
    val edges = a ++ b ++ bridge
    val r = got(edges, Seq(0L, 1L, 2L, 10L, 11L, 12L), 3)
    val bridgeVal = r((2L, 10L))._1
    (a ++ b).foreach { e =>
      assert(r.getOrElse(e, (0L, 0L))._1 < bridgeVal,
        s"bridge must dominate $e: ${r.get(e)} vs $bridgeVal")
    }
  }

  test("random digraphs match the in-memory edge twin") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(80)((rnd.nextInt(13).toLong, rnd.nextInt(13).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, 3L, 7L)
      assert(got(edges, seeds, 4) == brute(edges, seeds, 4), s"trial $trial")
    }
  }

  test("cross-consistency: non-seed outgoing edge sums equal the node dependency") {
    val rnd = new scala.util.Random(59)
    val edges = Seq.fill(70)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = Seq(1L, 5L)
    val edgeSums = Graphs.edgeBetweenness(edges.toDF("src", "dst"),
        seeds.toDF("seed"), 4)
      .groupBy(col("src")).agg(sum(col("ebc_ppm")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodeBc = Graphs.betweennessCentrality(edges.toDF("src", "dst"),
        seeds.toDF("seed"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((v, bc) <- nodeBc if !seeds.contains(v) && edgeSums.contains(v))
      assert(edgeSums(v) == bc, s"node $v: edge sum ${edgeSums(v)} != dd $bc")
  }
}
