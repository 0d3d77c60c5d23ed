package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.stronglyConnectedComponents]] — fixed-round FW-BW coloring
  * with convergence-GATED colored removal. Pins exact agreement with a
  * JVM Kosaraju ground truth when rounds suffice (settled groups keyed
  * by their minimum member), EXACTNESS under deliberately
  * under-budgeted rounds (every settled group equals one full true SCC
  * — never a merge, never a split; the 5-cycle-at-innerRounds-1 case
  * that the ungated algorithm would shatter into singletons comes back
  * settled = false instead), the hand cases (two cycles + one-way
  * bridge stay separate; a DAG is all singletons), and partitioning
  * invariance. */
class SccSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], outer: Int, inner: Int)
      : Map[String, (String, Boolean)] =
    Graphs.stronglyConnectedComponents(edges.toDF("src", "dst"), outer, inner)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap

  /** Kosaraju ground truth: SCC id = the minimum member id. */
  private def kosaraju(edges: Seq[(String, String)]): Map[String, String] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val fwd = edges.filter(e => e._1 != e._2).distinct.groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2) }
    val rev = edges.filter(e => e._1 != e._2).distinct.map(_.swap).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2) }
    val visited = scala.collection.mutable.Set.empty[String]
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def dfs1(v: String): Unit = {
      if (!visited(v)) {
        visited += v
        fwd.getOrElse(v, Nil).foreach(dfs1)
        order += v
      }
    }
    nodes.sorted.foreach(dfs1)
    val comp = scala.collection.mutable.Map.empty[String, String]
    def dfs2(v: String, root: String): Unit = {
      if (!comp.contains(v)) {
        comp(v) = root
        rev.getOrElse(v, Nil).foreach(dfs2(_, root))
      }
    }
    order.reverseIterator.foreach(v => dfs2(v, v))
    // normalize: scc id = minimum member
    val minOf = comp.toSeq.groupBy(_._2)
      .map { case (r, xs) => r -> xs.map(_._1).min }
    comp.map { case (v, r) => v -> minOf(r) }.toMap
  }

  test("adequate rounds: settled SCCs equal Kosaraju on random digraphs") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60)((s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
        .filter(e => e._1 != e._2).distinct
      val truth = kosaraju(edges)
      val got = run(edges, outer = 5, inner = 10)
      assert(got.keySet == truth.keySet, s"trial $trial node set")
      assert(got.forall(_._2._2 == true), s"trial $trial: everything settles")
      assert(got.map { case (v, (s, _)) => v -> s } == truth, s"trial $trial")
    }
  }

  test("exactness under tiny budgets: settled groups are FULL true SCCs (no merge, no split)") {
    val rnd = new scala.util.Random(73)
    val edges = Seq.fill(70)((s"m${rnd.nextInt(14)}", s"m${rnd.nextInt(14)}"))
      .filter(e => e._1 != e._2).distinct
    val truth = kosaraju(edges)
    val got = run(edges, outer = 1, inner = 2) // deliberately starved
    val settled = got.collect { case (v, (s, true)) => (v, s) }
    // removal is convergence-gated: every settled node carries its TRUE
    // Kosaraju id, and its whole true SCC settled with it — a settled
    // group can neither merge two SCCs nor ship a fragment of one
    settled.foreach { case (v, s) =>
      assert(s == truth(v), s"$v settled with $s, Kosaraju says ${truth(v)}")
    }
    val settledNodes = settled.map(_._1).toSet
    settledNodes.foreach { v =>
      val scc = truth.collect { case (u, r) if r == truth(v) => u }.toSet
      assert(scc.subsetOf(settledNodes),
        s"true SCC of $v settled only partially: ${scc -- settledNodes} missing")
    }
    // and under-budgeting is VISIBLE, not silent: leftovers say so
    assert(got.forall { case (v, (s, settled)) => settled || s == v })
  }

  test("a 5-cycle at innerRounds = 1 settles NOTHING (the gate refuses the split)") {
    // the forward fixpoint needs 4 relax rounds here; an ungated removal
    // would ship root n0 as a singleton settled=true — a silent SPLIT of
    // the one true SCC. The gate leaves all five settled=false instead.
    val edges = Seq(("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n4"),
      ("n4", "n0"))
    val got = run(edges, outer = 1, inner = 1)
    assert(got.size == 5)
    assert(got.forall { case (v, (s, settled)) => !settled && s == v },
      s"expected everything unsettled, got $got")
    // with budget the same cycle settles as ONE group under its minimum
    val full = run(edges, outer = 1, inner = 5)
    assert(full.forall { case (_, (s, settled)) => settled && s == "n0" })
  }

  test("two 3-cycles joined by a ONE-WAY bridge are separate SCCs") {
    val edges = Seq(("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
      ("b0", "b1"), ("b1", "b2"), ("b2", "b0"), ("a0", "b0"))
    val got = run(edges, 3, 5)
    assert(got("a0") == (("a0", true)) && got("a1") == (("a0", true))
      && got("a2") == (("a0", true)))
    assert(got("b0") == (("b0", true)) && got("b1") == (("b0", true))
      && got("b2") == (("b0", true)))
  }

  test("a DAG: trim eats the periphery; all singletons settle") {
    // diamond: trim assigns d1 (in-0) and d4 (out-0) immediately; the
    // stranded middle {d2, d3} has no internal edges and colors itself
    // — ONE outer round suffices (the trim step's whole point)
    val edges = Seq(("d1", "d2"), ("d1", "d3"), ("d2", "d4"), ("d3", "d4"))
    val got = run(edges, 1, 4)
    assert(got == Map("d1" -> (("d1", true)), "d2" -> (("d2", true)),
      "d3" -> (("d3", true)), "d4" -> (("d4", true))))
    // a 4-chain still needs a second round for its inner tail — and the
    // under-budgeted run SAYS so instead of mislabeling
    val chain = Seq(("c1", "c2"), ("c2", "c3"), ("c3", "c4"))
    val one = run(chain, 1, 4)
    assert(one("c1")._2 && one("c4")._2 && one("c2")._2 && !one("c3")._2)
    assert(run(chain, 2, 4).forall(_._2._2 == true))
  }

  test("partitioning invariance: repartitioned edges give the identical frame") {
    val rnd = new scala.util.Random(89)
    val edges = Seq.fill(50)((s"p${rnd.nextInt(10)}", s"p${rnd.nextInt(10)}"))
      .filter(e => e._1 != e._2).distinct
    val a = run(edges, 3, 6)
    val b = Graphs.stronglyConnectedComponents(
        edges.toDF("src", "dst").repartition(7), 3, 6)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(a == b)
  }
}
