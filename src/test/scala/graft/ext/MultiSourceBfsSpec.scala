package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.multiSourceBfs]] (the node-keyed bitmask MS-BFS plan behind
  * q307/q309/q311) must produce row-for-row the SAME (seed, node, d) set
  * as the pair-keyed [[Graphs.labeledBfs]] — including across the word
  * boundary (> 64 seeds → multi-word masks) and the sign bit (seed index
  * 63 lands on the long's sign bit; only &, |, ~ touch the masks). */
class MultiSourceBfsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def both(edges: Seq[(Long, Long)], seeds: Seq[Long], rounds: Int)
      : (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) =
    (rows(Graphs.multiSourceBfs(edges.toDF("src", "dst"), seeds.toDF("seed"), rounds)),
      rows(Graphs.labeledBfs(edges.toDF("src", "dst"), seeds.toDF("seed"), rounds)))

  test("random directed graphs, 70 all-node seeds (two words, sign bit in play)") {
    for (rndSeed <- Seq(13, 59); rounds <- Seq(1, 3, 5)) {
      val rnd = new scala.util.Random(rndSeed)
      val edges = Seq.fill(260)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = (0L until 70L)
      val (ms, lb) = both(edges, seeds, rounds)
      assert(ms == lb, s"seed $rndSeed rounds $rounds: MS-BFS != labeledBfs")
      assert(ms.nonEmpty && ms.exists(_._3 > 0L))
    }
  }

  test("exactly 64 and 65 seeds: word-boundary and single-word-max cases") {
    val rnd = new scala.util.Random(97)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    for (n <- Seq(64, 65)) {
      val (ms, lb) = both(edges, (0L until n.toLong), 3)
      assert(ms == lb, s"$n seeds diverged at the word boundary")
    }
  }

  test("disconnected seeds, seeds absent from the graph, and a 1-round horizon") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val (ms, lb) = both(edges, Seq(1L, 10L, 99L), 1)
    assert(ms == lb)
    assert(ms == Set((1L, 1L, 0L), (1L, 2L, 1L), (10L, 10L, 0L),
      (10L, 11L, 1L), (99L, 99L, 0L)))
  }

  test("host link graph at sf0.001, all hosts as seeds (the q307/q309 shape)") {
    val g = ExtraQueries.hostLinkGraph(spark, "/root/testdata/sf0.001")
    val seeds = g.select(org.apache.spark.sql.functions.col("src")).distinct()
    val ms = Graphs.multiSourceBfs(g, seeds, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val lb = Graphs.labeledBfs(g, seeds, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(ms == lb && ms.nonEmpty)
  }
}
