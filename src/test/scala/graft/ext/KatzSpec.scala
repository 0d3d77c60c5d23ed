package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.integerKatz]] — attenuated-walk centrality in exact integer
  * arithmetic. Pins a hand-computed chain fixed point, the
  * no-in-edges base injection, cycle symmetry, and a JVM replica on
  * random digraphs (one floor per node per round). */
class KatzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.integerKatz(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def replica(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        val s = edges.collect { case (u, `v`) => r(u) }.sum
        v -> (1000000L + s / 8L)
      }.toMap
    }
    r
  }

  test("chain a->b->c reaches its hand-computed fixed point") {
    val out = run(Seq((1L, 2L), (2L, 3L)), iters = 4)
    // r(a) = 1e6 (no in-edges); r(b) = 1e6 + 1e6/8 = 1125000;
    // r(c) = 1e6 + 1125000/8 = 1140625
    assert(out == Map(1L -> 1000000L, 2L -> 1125000L, 3L -> 1140625L))
  }

  test("directed cycle: symmetry forces equal ranks") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 5)
    assert(out.values.toSet.size == 1)
    assert(out(1L) > 1000000L, "walks accumulate around the cycle")
  }

  test("hub-of-hubs outranks a same-in-degree node fed by leaves") {
    // x is pointed to by two hubs (each with 3 in-edges); y by two leaves
    val hubFeed = Seq((10L, 1L), (11L, 1L), (12L, 1L),
      (13L, 2L), (14L, 2L), (15L, 2L))
    val edges = hubFeed ++ Seq((1L, 100L), (2L, 100L), (20L, 200L), (21L, 200L))
    val out = run(edges, iters = 4)
    assert(out(100L) > out(200L),
      "attenuated walks must credit the quality of the pointers")
  }

  test("random digraphs equal the JVM replica") {
    for (seed <- Seq(3, 47)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      assert(run(edges, 4) == replica(edges, 4), s"seed $seed")
    }
  }
}
