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
}
