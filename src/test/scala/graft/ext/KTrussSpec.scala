package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.kTrussEdges]] — fixed-round edge-support peel. Pins the
  * hand-built truss cases (triangle chains, a bridge that must fall, a
  * clique that must survive), cascade behavior across rounds, the
  * fixed-round contract (support recomputed on the final subgraph),
  * equality with a JVM replica on random graphs, and duplicate/
  * orientation invariance of the canonical edge form. */
class KTrussSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int, rounds: Int)
      : Map[(String, String), Long] =
    Graphs.kTrussEdges(edges.toDF("a", "b"), k, rounds)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  /** JVM replica: canonicalize, then `rounds` peels of support < k−2,
    * then one final support recount. */
  private def replica(edges: Seq[(String, String)], k: Int, rounds: Int)
      : Map[(String, String), Long] = {
    def canon(e: Seq[(String, String)]) =
      e.filter(x => x._1 != x._2)
        .map(x => if (x._1 < x._2) x else x.swap).distinct
    def support(es: Seq[(String, String)]): Map[(String, String), Long] = {
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).toSet }
      es.map { case (a, b) =>
        (a, b) -> (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty))
          .size.toLong
      }.toMap
    }
    var cur = canon(edges)
    for (_ <- 1 to rounds) {
      val s = support(cur)
      cur = cur.filter(e => s(e) >= (k - 2).toLong)
    }
    support(cur)
  }

  test("a 4-clique survives the 4-truss; the pendant triangle falls") {
    // K4 on a,b,c,d (every edge in 2 triangles) + triangle (d,e,f)
    // hanging off d (each of its edges in exactly 1 triangle)
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    val pend = Seq(("d", "e"), ("d", "f"), ("e", "f"))
    val out = run(k4 ++ pend, k = 4, rounds = 2)
    assert(out.keySet == k4.toSet, s"4-truss must be exactly the K4: $out")
    assert(out.values.forall(_ == 2L), "every K4 edge sits in 2 triangles")
    // the pendant triangle IS a 3-truss
    val t3 = run(k4 ++ pend, k = 3, rounds = 2)
    assert(t3.keySet == (k4 ++ pend).toSet)
  }

  test("cascade: peeling one edge's support collapses a triangle chain") {
    // triangles sharing edges in a chain: t1=(a,b,c), t2=(b,c,d),
    // t3=(c,d,e); 4-truss demands support >= 2, only (b,c),(c,d) have
    // it initially — one round leaves no triangles, the second empties
    val chain = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("c", "e"), ("d", "e"))
    val r1 = run(chain, k = 4, rounds = 1)
    assert(r1.keySet == Set(("b", "c"), ("c", "d")),
      s"round 1 keeps only the shared edges: $r1")
    // fixed-round contract: their support on the SURVIVING subgraph is 0
    assert(r1.values.forall(_ == 0L))
    val r2 = run(chain, k = 4, rounds = 2)
    assert(r2.isEmpty, "round 2 peels the no-longer-supported survivors")
  }

  test("random graphs equal the JVM replica across k and rounds") {
    val rnd = new scala.util.Random(83)
    val edges = Seq.fill(120)((s"v${rnd.nextInt(15)}", s"v${rnd.nextInt(15)}"))
      .filter(e => e._1 != e._2)
    for (k <- Seq(3, 4); rounds <- Seq(1, 3))
      assert(run(edges, k, rounds) == replica(edges, k, rounds),
        s"k=$k rounds=$rounds")
  }

  test("duplicates, self-loops, and orientation are canonicalized away") {
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val messy = tri ++ tri.map(_.swap) ++ Seq(("a", "a"), ("b", "c"), ("b", "c"))
    assert(run(messy, 3, 2) == run(tri, 3, 2))
    assert(run(tri, 3, 2) == Map(("a", "b") -> 1L, ("b", "c") -> 1L,
      ("a", "c") -> 1L))
  }
}
