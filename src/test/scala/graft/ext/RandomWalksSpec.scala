package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.randomWalks]] — deterministic DeepWalk-style walk corpus.
  * Pins the trajectory against a JVM replica of the hash-mod-degree
  * choice rule, walk-validity invariants (every hop is an edge, step 0
  * is the origin, full length on symmetric graphs), sink termination on
  * directed graphs, and partitioning invariance (pure hash, no RNG). */
class RandomWalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** JVM replica of the engine's portable 60-bit hash:
    * conv(substring(md5(key),1,15),16,10). */
  private def hash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side walk simulation with the identical choice rule. */
  private def simulate(edges: Seq[(String, String)], origins: Seq[String],
      walks: Int, steps: Int): Set[(String, Long, Long, String)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).distinct.sorted
    }
    val out = scala.collection.mutable.Set.empty[(String, Long, Long, String)]
    for (o <- origins; w <- 0 until walks) {
      var cur = o
      out += ((o, w.toLong, 0L, cur))
      var s = 1
      var alive = true
      while (s <= steps && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val idx = (hash60(s"$o:$w:$s:$cur") % nbrs.size).toInt
            cur = nbrs(idx)
            out += ((o, w.toLong, s.toLong, cur))
          case None => alive = false
        }
        s += 1
      }
    }
    out.toSet
  }

  private def run(edges: Seq[(String, String)], origins: Seq[String],
      walks: Int, steps: Int): Set[(String, Long, Long, String)] =
    Graphs.randomWalks(edges.toDF("src", "dst"), origins.toDF("origin"),
        walks, steps)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  private def sym(e: Seq[(String, String)]): Seq[(String, String)] =
    (e ++ e.map(_.swap)).distinct

  test("trajectories equal the JVM hash replica on a random symmetric graph") {
    val rnd = new scala.util.Random(17)
    val base = Seq.fill(60)((s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
      .filter(e => e._1 != e._2).distinct
    val edges = sym(base)
    val origins = edges.map(_._1).distinct
    val got = run(edges, origins, walks = 3, steps = 5)
    assert(got == simulate(edges, origins, 3, 5))
    assert(got.nonEmpty)
  }

  test("every hop is an edge; step 0 is the origin; full length on symmetric graphs") {
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")))
    val got = run(edges, Seq("a", "b", "c", "d"), walks = 2, steps = 4)
    val edgeSet = edges.toSet
    val byWalk = got.groupBy(t => (t._1, t._2))
    assert(byWalk.size == 8)
    for (((o, _), rows) <- byWalk) {
      val path = rows.toSeq.sortBy(_._3).map(_._4)
      assert(path.size == 5, "symmetric graph: every walk runs full length")
      assert(path.head == o, "step 0 is the origin")
      path.sliding(2).foreach { case Seq(u, v) =>
        assert(edgeSet.contains((u, v)), s"hop $u->$v is not an edge")
      }
    }
  }

  test("a walk reaching a sink terminates: later steps are absent, not null") {
    // directed chain a -> b -> c; c has no outgoing edges
    val edges = Seq(("a", "b"), ("b", "c"))
    val got = run(edges, Seq("a"), walks = 1, steps = 5)
    assert(got == Set(("a", 0L, 0L, "a"), ("a", 0L, 1L, "b"), ("a", 0L, 2L, "c")))
  }

  test("duplicated origin rows produce the identical corpus (distinct enforced)") {
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    val once = run(edges, Seq("a", "b"), walks = 2, steps = 3)
    val duped = Graphs.randomWalks(edges.toDF("src", "dst"),
        Seq("a", "a", "b", "a").toDF("origin"), 2, 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(duped.toSet == once)
    assert(duped.length == duped.distinct.length, "no duplicate corpus rows")
  }

  test("hop plan: two equi joins, no pmod residual in any join condition (O(|walks|) probe)") {
    // The chosen rank ridx = hash60 % deg is computed ON the frontier
    // after a node-keyed degree join, so the adjacency join is a pure
    // composite-key equi join — the per-hop intermediate is |walks|
    // rows, never the Σ deg(cur) fan-out a build-side pmod residual
    // would force.
    import org.apache.spark.sql.functions.{col, count, expr, lit, row_number}
    import org.apache.spark.sql.expressions.Window
    val edges = sym(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")))
    val wAdj = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = edges.toDF("src", "dst").distinct()
      .select(col("src"), col("dst"),
        (row_number().over(wAdj) - 1).cast("long").as("idx"),
        count(lit(1)).over(Window.partitionBy(col("src"))).as("deg"))
    val degT = adj.select(col("src").as("d_src"), col("deg")).distinct()
    val state = Seq(("a", 0L), ("b", 0L)).toDF("origin", "walk")
      .withColumn("cur", col("origin"))
    val hop = Graphs.walkHop(state, degT, adj, s = 1)
    val plan = hop.queryExecution.executedPlan.toString
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.size == 2, s"expected exactly two joins, got:\n$plan")
    assert(joinLines.forall(l => !l.contains("pmod")),
      s"hash-mod must live in a Project, not a join condition:\n$plan")
    assert(joinLines.exists(l => l.contains("idx")),
      s"adjacency join must carry idx as an equi key:\n$plan")
    // and the hop output is correct: one next-node per (origin, walk)
    assert(hop.collect().length == 2)
  }

  test("partitioning invariance: repartitioned edges produce the identical corpus") {
    val rnd = new scala.util.Random(23)
    val edges = sym(Seq.fill(40)((s"h${rnd.nextInt(9)}", s"h${rnd.nextInt(9)}"))
      .filter(e => e._1 != e._2).distinct)
    val origins = edges.map(_._1).distinct
    val a = run(edges, origins, walks = 2, steps = 3)
    val b = Graphs.randomWalks(edges.toDF("src", "dst").repartition(7),
        origins.toDF("origin").repartition(3), 2, 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(a == b)
  }
}
