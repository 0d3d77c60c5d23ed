package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.skipGramPairs]] — the word2vec training table over a walk
  * corpus. Pins equality with a JVM replica on random corpora, the
  * hand-computed single-walk case, window semantics at the corpus
  * edges, truncated (sink-terminated) walks, and symmetry (every
  * (x, y) observation has its mirrored (y, x)). */
class SkipGramPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(corpus: Seq[(String, Long, Long, String)], window: Int)
      : Map[(String, String), Long] =
    Graphs.skipGramPairs(
        corpus.toDF("origin", "walk", "step", "node"), window)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def replica(corpus: Seq[(String, Long, Long, String)], window: Int)
      : Map[(String, String), Long] =
    corpus.groupBy(t => (t._1, t._2)).values.flatMap { walk =>
      for {
        a <- walk; b <- walk
        d = a._3 - b._3
        if d != 0 && math.abs(d) <= window
      } yield (a._4, b._4)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("single walk a-b-c-d, window 2: hand-computed pair counts") {
    val corpus = Seq(("a", 0L, 0L, "a"), ("a", 0L, 1L, "b"),
      ("a", 0L, 2L, "c"), ("a", 0L, 3L, "d"))
    val got = run(corpus, 2)
    // distance-1: (a,b) (b,c) (c,d) both ways; distance-2: (a,c) (b,d)
    assert(got == Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L, ("c", "b") -> 1L,
      ("c", "d") -> 1L, ("d", "c") -> 1L, ("a", "c") -> 1L, ("c", "a") -> 1L,
      ("b", "d") -> 1L, ("d", "b") -> 1L))
  }

  test("random corpora equal the JVM replica; mirrored counts are equal") {
    val rnd = new scala.util.Random(71)
    for (window <- Seq(1, 2, 3)) {
      val corpus = for {
        o <- Seq("o1", "o2", "o3"); w <- 0L to 2L
        len = 1 + rnd.nextInt(5) // truncated walks included
        s <- 0L until len.toLong
      } yield (o, w, s, s"n${rnd.nextInt(6)}")
      val got = run(corpus, window)
      assert(got == replica(corpus, window), s"window $window")
      got.foreach { case ((x, y), c) =>
        assert(got((y, x)) == c, s"asymmetric count for ($x, $y)")
      }
    }
  }

  test("walks never pair across (origin, walk) boundaries") {
    val corpus = Seq(("a", 0L, 0L, "x"), ("a", 0L, 1L, "y"),
      ("a", 1L, 0L, "p"), ("a", 1L, 1L, "q"),
      ("b", 0L, 0L, "r"), ("b", 0L, 1L, "s"))
    val got = run(corpus, 3)
    assert(got.keySet == Set(("x", "y"), ("y", "x"), ("p", "q"), ("q", "p"),
      ("r", "s"), ("s", "r")))
  }

  test("repeat visits accumulate counts (a cycle walk revisits its nodes)") {
    val corpus = Seq(("c", 0L, 0L, "u"), ("c", 0L, 1L, "v"),
      ("c", 0L, 2L, "u"), ("c", 0L, 3L, "v"))
    val got = run(corpus, 1)
    assert(got == Map(("u", "v") -> 3L, ("v", "u") -> 3L))
  }

  test("real randomWalks corpus composes: counts match the replica end-to-end") {
    val base = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"))
    val edges = (base ++ base.map(_.swap)).distinct
    val corpus = Graphs.randomWalks(edges.toDF("src", "dst"),
        edges.map(_._1).distinct.toDF("origin"), walksPerNode = 2, steps = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(run(corpus, 2) == replica(corpus, 2))
  }
}
