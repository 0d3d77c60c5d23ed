package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.modularityGainMove]] — one synchronous integer Louvain
  * move pass. Pins equality with a JVM replica of the cross-multiplied
  * score on random graphs, the hand-checked two-triangle merge, the
  * stay-put case (already-optimal labels are a fixed point), the
  * smaller-label tie-break, and that a pass never DECREASES global
  * modularity on the classic singleton start. */
class ModularityGainMoveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], labels: Seq[(String, String)])
      : Map[String, String] =
    Graphs.modularityGainMove(edges.toDF("a", "b"), labels.toDF("node", "lab"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Driver replica of score(i → c) = 2m·k_in(c) − k_i·(Σtot(c) − [c=cur]·k_i),
    * argmax with smaller-label tie-break, candidates = {cur} ∪ nbr labels. */
  private def replica(edges: Seq[(String, String)], labels: Seq[(String, String)])
      : Map[String, String] = {
    val m = edges.size.toLong
    val sym = edges ++ edges.map(_.swap)
    val adj = sym.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val lab = labels.toMap
    val deg = adj.map { case (n, xs) => n -> xs.size.toLong }
    val tot = deg.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    adj.keys.map { i =>
      val cur = lab(i)
      val kin = adj(i).groupBy(lab).map { case (c, xs) => c -> xs.size.toLong }
      val cands = (kin.keySet + cur).toSeq.sorted
      val best = cands.minBy { c =>
        val score = 2L * m * kin.getOrElse(c, 0L) -
          deg(i) * (tot(c) - (if (c == cur) deg(i) else 0L))
        (-score, c)
      }
      i -> best
    }.toMap
  }

  test("repair: one mislabeled node moves home, everyone else stays, Q strictly rises") {
    // the operator's honest contract (see the synchronous caveat in the
    // doc): from a NEAR-converged assignment — triangle A coalesced,
    // triangle D coalesced except node f mislabeled into A — the sweep
    // must send f home and leave every correctly-labeled node put
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
    val labels = Seq("a" -> "A", "b" -> "A", "c" -> "A",
      "d" -> "D", "e" -> "D", "f" -> "A")
    val out = run(edges, labels)
    assert(out == replica(edges, labels))
    assert(out == Map("a" -> "A", "b" -> "A", "c" -> "A",
      "d" -> "D", "e" -> "D", "f" -> "D"))
    // Q (shared-denominator numerator) strictly rises with the repair
    def qNum(l: Map[String, String]): Long = {
      val m = edges.size.toLong
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
      l.values.toSeq.distinct.map { c =>
        val members = l.collect { case (n, lc) if lc == c => n }.toSet
        val ec = edges.count(e => members(e._1) && members(e._2)).toLong
        val dc = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
        4L * m * ec - dc * dc
      }.sum
    }
    assert(qNum(out) > qNum(labels.toMap), "the repair must raise Q")
  }

  test("singleton start: the synchronous first sweep equals the replica (oscillation and all)") {
    // from singletons the sweep is the classic synchronous shuffle —
    // adjacent pairs may label-swap (the documented caveat); the
    // contract is bit-exact determinism, pinned against the replica
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
    val labels = Seq("a", "b", "c", "d", "e", "f").map(n => n -> n)
    val out = run(edges, labels)
    assert(out == replica(edges, labels))
    assert(out.nonEmpty)
  }

  test("already-coalesced labels are a fixed point (stay-put beats any move)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
    val labels = Seq("a" -> "A", "b" -> "A", "c" -> "A",
      "d" -> "D", "e" -> "D", "f" -> "D")
    val out = run(edges, labels)
    assert(out == labels.toMap)
  }

  test("tie-break goes to the smaller community label") {
    // node x bridges two identical communities; both moves score equally
    val edges = Seq(("p1", "p2"), ("q1", "q2"), ("x", "p1"), ("x", "q1"))
    val labels = Seq("p1" -> "P", "p2" -> "P", "q1" -> "Q", "q2" -> "Q",
      "x" -> "x")
    val out = run(edges, labels)
    assert(out == replica(edges, labels))
    assert(out("x") == "P", s"tie must break to the smaller label: $out")
  }

  test("random graphs equal the replica, from singletons AND from LPA-like starts") {
    // no monotonicity claim here — a synchronous sweep from singletons
    // can lower Q (the documented oscillation; trial 1 of this very
    // fixture does). The contract under test is bit-exact determinism
    // against the integer score formula, from both start families.
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(70)((s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}"))
        .filter(e => e._1 != e._2)
        .map(e => if (e._1 < e._2) e else e.swap).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val singletons = nodes.map(n => n -> n)
      assert(run(edges, singletons) == replica(edges, singletons),
        s"trial $trial singletons")
      val coarse = nodes.map(n => n -> s"c${n.hashCode.abs % 3}")
      assert(run(edges, coarse) == replica(edges, coarse),
        s"trial $trial coarse start")
    }
  }
}
