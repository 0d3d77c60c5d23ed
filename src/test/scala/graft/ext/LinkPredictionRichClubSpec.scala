package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.linkPredictionScores]] and [[Graphs.richClub]]. Link
  * prediction: hand wedges (cn and the floored RA term), existing-edge
  * exclusion, a JVM replica on random graphs, partition invariance.
  * Rich club: hand clubs, the <2-member omission, a JVM replica. */
class LinkPredictionRichClubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lp(edges: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long)] =
    Graphs.linkPredictionScores(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("path u-z-v: one candidate pair, cn = 1, ra = 1e6 div deg(z)") {
    // z also has a third neighbor w -> deg(z) = 3; candidates are all
    // non-adjacent pairs among {u, v, w} through z
    val got = lp(Seq((1L, 2L), (2L, 3L), (2L, 4L)))
    // pairs through z=2: (1,3), (1,4), (3,4) — none adjacent
    assert(got.keySet == Set((1L, 3L), (1L, 4L), (3L, 4L)))
    assert(got((1L, 3L)) == ((1L, 1000000L / 3L)))
    assert(got((3L, 4L)) == ((1L, 333333L)))
  }

  test("existing edges are excluded; two shared neighbors sum their floored terms") {
    // square 1-2-3-4-1: (1,3) share {2,4}, (2,4) share {1,3}; all degs 2
    val got = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(got.keySet == Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) == ((2L, 1000000L))) // 2 x (1e6 div 2)
    // now close the square's diagonal: (1,3) becomes an edge and drops out
    val closed = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)))
    assert(!closed.contains((1L, 3L)) && closed.contains((2L, 4L)))
  }

  test("random graphs equal a JVM replica; repartitioning changes nothing") {
    val rnd = new scala.util.Random(97)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    val deg = adj.map { case (n, s) => n -> s.size.toLong }
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      u <- nodes; v <- nodes if u < v && !adj(u).contains(v)
      shared = adj(u).intersect(adj(v)) if shared.nonEmpty
    } yield (u, v) -> ((shared.size.toLong,
      shared.toSeq.map(z => 1000000L / deg(z)).sum))).toMap
    assert(lp(edges) == expected)
    val rep = Graphs.linkPredictionScores(
        edges.toDF("a", "b").repartition(11))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rep == expected)
  }

  private def rc(edges: Seq[(Long, Long)], ks: Seq[Int])
      : Map[Long, (Long, Long, Long)] =
    Graphs.richClub(edges.toDF("a", "b"), ks)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("rich club: star + clique hand case, tiny clubs omitted") {
    // 4-clique {1,2,3,4} (deg 3 inside) + leaves 5,6 hanging off 1
    // degs: 1 -> 5, others in clique -> 3, leaves -> 1
    val clique = for (x <- 1L to 4L; y <- (x + 1) to 4L) yield (x, y)
    val edges = clique ++ Seq((1L, 5L), (1L, 6L))
    val got = rc(edges, Seq(1, 2, 4))
    // k=1: club = {1,2,3,4} (deg>1), E=6 -> phi = 12e6/12 = 1e6
    assert(got(1L) == ((4L, 6L, 1000000L)))
    // k=2: same club (degs 3,3,3,5) -> identical
    assert(got(2L) == ((4L, 6L, 1000000L)))
    // k=4: club = {1} only -> omitted (fewer than 2 members)
    assert(!got.contains(4L))
  }

  test("avg neighbor degree: star hand case + JVM replica on random graphs") {
    // star center 0 with 4 leaves: class deg=4 (center) sees leaves
    // (deg 1) -> knn = 1e6; class deg=1 (leaves) sees the center -> 4e6
    val star = (1L to 4L).map(l => (0L, l))
    val got = Graphs.avgNeighborDegree(star.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(4L -> ((1L, 1000000L)), 1L -> ((4L, 4000000L))))

    val rnd = new scala.util.Random(149)
    val edges = Seq.fill(120)((rnd.nextInt(22).toLong, rnd.nextInt(22).toLong))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2) }
    val deg = adj.map { case (n, s) => n -> s.size.toLong }
    val expected = adj.groupBy { case (n, _) => deg(n) }.map { case (k, nodes) =>
      val ends = nodes.toSeq.flatMap(_._2).map(deg)
      k -> ((nodes.size.toLong,
        (BigInt(ends.sum) * 1000000 / ends.size).toLong))
    }
    val g2 = Graphs.avgNeighborDegree(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g2 == expected)
  }

  test("rich club: random graph equals a JVM replica") {
    val rnd = new scala.util.Random(101)
    val edges = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val ks = Seq(1, 2, 3, 5, 8)
    val expected = ks.flatMap { k =>
      val club = deg.filter(_._2 > k).keySet
      val ek = edges.count(e => club(e._1) && club(e._2)).toLong
      val nk = club.size.toLong
      if (nk >= 2)
        Some(k.toLong -> ((nk, ek,
          (BigInt(2) * ek * 1000000 / (BigInt(nk) * (nk - 1))).toLong)))
      else None
    }.toMap
    assert(rc(edges, ks) == expected)
  }
}
