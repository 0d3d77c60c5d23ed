package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.harmonicCentrality]] against a brute-force in-test
  * Floyd–Warshall oracle, plus the contract edges: the hop bound truncates
  * (not approximates) contributions, disconnected components contribute
  * exactly 0 to each other, and seed sampling restricts the sum to sampled
  * sources only. */
class HarmonicCentralitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def got(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, (Long, Long)] =
    Graphs.harmonicCentrality(
        (edges ++ edges.map(_.swap)).distinct.toDF("src", "dst"),
        seeds.toDF("seed"), rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** brute hop-bounded harmonic over the symmetrized graph */
  private def brute(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++ seeds).distinct
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    def dists(s: Long): Map[Long, Int] = {
      var d = Map(s -> 0); var frontier = Set(s)
      for (r <- 1 to rounds) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(d.contains)
        d ++= frontier.map(_ -> r); ()
      }
      d
    }
    val all = seeds.distinct.flatMap(s => dists(s).toSeq.map { case (v, d) => (v, d) })
      .filter(_._2 >= 1)
    nodes.flatMap { v =>
      val ds = all.filter(_._1 == v).map(_._2)
      if (ds.isEmpty) None
      else Some(v -> ((ds.map(1000000L / _).sum, ds.size.toLong)))
    }.toMap
  }

  test("path graph, all seeds: matches brute Floyd-Warshall-style oracle") {
    val path = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    val seeds = (1L to 7L)
    for (rounds <- Seq(1, 2, 4)) {
      assert(got(path, seeds, rounds) == brute(path, seeds, rounds),
        s"rounds=$rounds")
    }
  }

  test("hop bound truncates: far pairs contribute nothing until rounds reach them") {
    val path = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    val r2 = got(path, 1L to 7L, 2)
    // node 4 at rounds=2 sees 2,3,5,6 only: 2*(10^6/1) + 2*(10^6/2)
    assert(r2(4L) == ((3000000L, 4L)))
    // endpoint 1 sees 2 (d=1) and 3 (d=2)
    assert(r2(1L) == ((1500000L, 2L)))
  }

  test("disconnected components and seed sampling") {
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val all = got(g, Seq(1L, 2L, 3L, 10L, 11L), 4)
    // cross-component contributions are exactly zero
    assert(all(10L) == ((1000000L, 1L)) && all(11L) == ((1000000L, 1L)))
    assert(all == brute(g, Seq(1L, 2L, 3L, 10L, 11L), 4))
    // sampled seeds: only sampled sources contribute
    val sampled = got(g, Seq(1L), 4)
    assert(sampled == Map(2L -> ((1000000L, 1L)), 3L -> ((500000L, 1L))))
  }

  test("distance histogram matches brute distances; cum_ppm ends at exactly 10^6") {
    val rnd = new scala.util.Random(71)
    val edges = Seq.fill(90)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    val R = 3
    val bruteD = nodes.flatMap { s =>
      var d = Map(s -> 0); var frontier = Set(s)
      for (r <- 1 to R) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(d.contains)
        d ++= frontier.map(_ -> r); ()
      }
      d.values.filter(_ >= 1)
    }
    val wantHist = bruteD.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = bruteD.size.toLong
    val got = Graphs.distanceHistogram(
        (edges ++ edges.map(_.swap)).distinct.toDF("src", "dst"),
        nodes.toDF("seed"), R)
      .orderBy(col("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => r._1 -> r._2).toMap == wantHist.map { case (k, v) => k.toLong -> v })
    var cum = 0L
    for ((d, n, c, ppm) <- got) {
      cum += n
      assert(c == cum && ppm == cum * 1000000L / total, s"d=$d")
    }
    assert(got.last._4 == 1000000L, "cumulative share must end at exactly 10^6")
  }

  test("random graph equals brute oracle (two seeds sets)") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val allNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got(edges, allNodes, 3) == brute(edges, allNodes, 3))
    val sample = allNodes.filter(_ % 3 == 0)
    assert(got(edges, sample, 3) == brute(edges, sample, 3))
  }
}
