package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.node2vecWalks]] — second-order biased walks. Pins the full
  * trajectory against a JVM replica of the weight/cumulative-slot rule,
  * the p/q bias directions at their extremes, the uniform-first-hop ≡
  * [[Graphs.randomWalks]] prefix identity (same hash key, wt=1 slots
  * rank like hash-mod-degree), and partitioning invariance. */
class Node2vecWalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def simulate(edges: Seq[(String, String)], origins: Seq[String],
      walks: Int, steps: Int, retW: Long, comW: Long, outW: Long)
      : Set[(String, Long, Long, String)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct.sorted }
    val eSet = edges.toSet
    val out = scala.collection.mutable.Set.empty[(String, Long, Long, String)]
    for (o <- origins; w <- 0 until walks) {
      var prev = o
      var cur = o
      out += ((o, w.toLong, 0L, cur))
      var s = 1
      var alive = true
      while (s <= steps && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val wts = nbrs.map { n =>
              if (s == 1) 1L
              else if (n == prev) retW
              else if (eSet.contains((prev, n))) comW
              else outW
            }
            val tot = wts.sum
            val r = hash60(s"$o:$w:$s:$cur") % tot
            var cum = 0L
            var picked = -1
            for (i <- nbrs.indices if picked < 0) {
              cum += wts(i)
              if (r < cum) picked = i
            }
            prev = cur
            cur = nbrs(picked)
            out += ((o, w.toLong, s.toLong, cur))
          case None => alive = false
        }
        s += 1
      }
    }
    out.toSet
  }

  private def run(edges: Seq[(String, String)], origins: Seq[String],
      walks: Int, steps: Int, retW: Int, comW: Int, outW: Int)
      : Set[(String, Long, Long, String)] =
    Graphs.node2vecWalks(edges.toDF("src", "dst"), origins.toDF("origin"),
        walks, steps, retW, comW, outW)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  private def sym(e: Seq[(String, String)]): Seq[(String, String)] =
    (e ++ e.map(_.swap)).distinct

  test("trajectories equal the JVM replica on a random symmetric graph") {
    val rnd = new scala.util.Random(29)
    val edges = sym(Seq.fill(70)((s"n${rnd.nextInt(13)}", s"n${rnd.nextInt(13)}"))
      .filter(e => e._1 != e._2).distinct)
    val origins = edges.map(_._1).distinct
    val got = run(edges, origins, 2, 5, retW = 250, comW = 1000, outW = 500)
    assert(got == simulate(edges, origins, 2, 5, 250L, 1000L, 500L))
    assert(got.nonEmpty)
  }

  test("huge return weight: every step >= 2 backtracks to the predecessor") {
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")))
    val got = run(edges, Seq("a", "b", "c", "d"), 2, 5,
      retW = 1000000, comW = 1, outW = 1)
    for (((o, w), rows) <- got.groupBy(t => (t._1, t._2))) {
      val path = rows.toSeq.sortBy(_._3).map(_._4)
      for (i <- 2 until path.size)
        assert(path(i) == path(i - 2),
          s"walk $o/$w did not return at step $i: $path")
    }
  }

  test("tiny return weight on a cycle: walks never backtrack") {
    // square cycle: from cur the non-prev neighbor is always unique
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
    val got = run(edges, Seq("a", "b", "c", "d"), 2, 6,
      retW = 1, comW = 1000000, outW = 1000000)
    // retW=1 of tot=2000001: a backtrack needs r in a 1-slot window —
    // with 48 hops the hash would have to land it; assert none did
    for (((o, w), rows) <- got.groupBy(t => (t._1, t._2))) {
      val path = rows.toSeq.sortBy(_._3).map(_._4)
      for (i <- 2 until path.size)
        assert(path(i) != path(i - 2), s"walk $o/$w backtracked: $path")
    }
  }

  test("first hop is uniform and identical to randomWalks (shared hash key)") {
    val rnd = new scala.util.Random(37)
    val edges = sym(Seq.fill(40)((s"h${rnd.nextInt(9)}", s"h${rnd.nextInt(9)}"))
      .filter(e => e._1 != e._2).distinct)
    val origins = edges.map(_._1).distinct
    val n2v = run(edges, origins, 2, 1, retW = 250, comW = 1000, outW = 500)
    val rw = Graphs.randomWalks(edges.toDF("src", "dst"),
        origins.toDF("origin"), 2, 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(n2v == rw)
  }

  test("duplicated origin rows produce the identical corpus (distinct enforced)") {
    // Unguarded, a duplicate origin row would double every (origin,
    // walk) state row, the cumulative window would then double tot with
    // overlapping slots, and the slot pick could match 0 or 2 rows —
    // walks silently vanishing or forking.
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    val once = run(edges, Seq("a", "b"), 2, 3, 250, 1000, 500)
    val duped = Graphs.node2vecWalks(edges.toDF("src", "dst"),
        Seq("a", "a", "b", "a").toDF("origin"), 2, 3, 250, 1000, 500)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(duped.toSet == once)
    assert(duped.length == duped.distinct.length, "no duplicate corpus rows")
  }

  test("sink termination and partitioning invariance") {
    val edges = Seq(("a", "b"), ("b", "c")) // directed; c is a sink
    assert(run(edges, Seq("a"), 1, 5, 250, 1000, 500) ==
      Set(("a", 0L, 0L, "a"), ("a", 0L, 1L, "b"), ("a", 0L, 2L, "c")))
    val rnd = new scala.util.Random(43)
    val g = sym(Seq.fill(40)((s"h${rnd.nextInt(8)}", s"h${rnd.nextInt(8)}"))
      .filter(e => e._1 != e._2).distinct)
    val origins = g.map(_._1).distinct
    val a = run(g, origins, 2, 3, 250, 1000, 500)
    val b = Graphs.node2vecWalks(g.toDF("src", "dst").repartition(5),
        origins.toDF("origin").repartition(3), 2, 3, 250, 1000, 500)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(a == b)
  }
}
