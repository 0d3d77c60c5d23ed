package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalKTruss]] — the twelfth maintained form.
  * Contract: folding a disjoint additive edge wave into the stored
  * peel trajectory + readout equals the one-shot [[Graphs.kTrussEdges]]
  * over the union graph. Coverage map (the incremental-family house
  * pattern): random waves incl. CHAINED (≡ batch), ball-boundary
  * POISON (a phantom far edge planted in the stored state survives —
  * pass-through is provably not recomputed), the resurrection cascade
  * (a delta triangle saves an edge whose survival then saves another),
  * and distance precision (a far component is byte-identical). */
class IncrementalKTrussSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(edges: Seq[(String, String)]) = edges.toDF("a", "b")

  private def outOf(df: DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def inc(base: Seq[(String, String)], delta: Seq[(String, String)],
      k: Int, rounds: Int): Map[(String, String), Long] =
    outOf(Graphs.incrementalKTruss(
      Graphs.kTrussTrace(frame(base), k, rounds),
      Graphs.kTrussEdges(frame(base), k, rounds),
      frame(base), frame(delta), k, rounds))

  test("random waves, chained: maintained readout equals the one-shot batch") {
    for (seedVal <- Seq(19, 47)) {
      val rnd = new scala.util.Random(seedVal)
      val all = Seq.fill(110)((s"v${rnd.nextInt(14)}", s"v${rnd.nextInt(14)}"))
        .filter(e => e._1 != e._2)
        .map(e => if (e._1 < e._2) e else e.swap).distinct
      val tagged = all.map(e => e -> rnd.nextInt(5))
      val base = tagged.filter(_._2 < 3).map(_._1)
      val wave1 = tagged.filter(_._2 == 3).map(_._1)
      val wave2 = tagged.filter(_._2 == 4).map(_._1)
      assert(inc(base, wave1, 3, 2) ==
        outOf(Graphs.kTrussEdges(frame(base ++ wave1), 3, 2)),
        s"seed $seedVal wave 1, k=3")
      // chain: wave-2 maintenance on top of the union of wave 1
      assert(inc(base ++ wave1, wave2, 4, 3) ==
        outOf(Graphs.kTrussEdges(frame(all), 4, 3)),
        s"seed $seedVal wave 2, k=4")
    }
  }

  test("ball-boundary POISON: a phantom far edge planted in stored state survives") {
    // component A: K4 on a1..a4 (delta lands here); component B:
    // triangle b1,b2,b3 far away. Plant a phantom edge (z1, z2) in
    // BOTH stored frames — a recompute of the out-of-ball region would
    // erase it; verbatim pass-through must carry it.
    val k4 = Seq(("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"),
      ("a2", "a4"), ("a3", "a4"))
    val triB = Seq(("b1", "b2"), ("b1", "b3"), ("b2", "b3"))
    val base = k4 ++ triB
    val delta = Seq(("a1", "x"), ("a2", "x")) // new triangle in A
    val trace = Graphs.kTrussTrace(frame(base), 3, 2)
      .unionByName(Seq((0L, "z1", "z2"), (1L, "z1", "z2"), (2L, "z1", "z2"))
        .toDF("round", "a", "b"))
    val out = Graphs.kTrussEdges(frame(base), 3, 2)
      .unionByName(Seq(("z1", "z2", 777L)).toDF("a", "b", "support"))
    val got = outOf(Graphs.incrementalKTruss(
      trace, out, frame(base), frame(delta), 3, 2))
    assert(got(("z1", "z2")) == 777L, s"poison must survive: $got")
    // the real edges still equal poison-free batch
    val batch = outOf(Graphs.kTrussEdges(frame(base ++ delta), 3, 2))
    assert((got - (("z1", "z2"))) == batch)
  }

  test("resurrection cascade: a delta triangle saves an edge that then saves another") {
    // path-of-triangles where the tail lacks support in base: base
    // t1 = (c1,c2,c3) only; edges (c3,c4), (c4,c5) are triangle-free
    // and die in round 1. The delta adds (c3,c5)... no — adds the
    // closing edges (c2,c4) and (c4,c5)'s partner (c3,c5): now
    // (c3,c4) sits in triangle (c3,c4,c2)? Build explicitly:
    //   base: (c1,c2) (c1,c3) (c2,c3) (c3,c4) (c4,c5) (c3,c5)
    //   base triangles: (c1,c2,c3) and (c3,c4,c5)
    //   at k=4 (support >= 2) ALL die in base round 1
    //   delta: (c2,c4), (c2,c5) — creates overlapping triangles that
    //   keep a 4-truss-ish core alive through the replay
    val base = Seq(("c1", "c2"), ("c1", "c3"), ("c2", "c3"),
      ("c3", "c4"), ("c4", "c5"), ("c3", "c5"))
    val delta = Seq(("c2", "c4"), ("c2", "c5"))
    for (k <- Seq(3, 4); rounds <- Seq(1, 2, 3))
      assert(inc(base, delta, k, rounds) ==
        outOf(Graphs.kTrussEdges(frame(base ++ delta), k, rounds)),
        s"k=$k rounds=$rounds")
  }

  test("distance precision: a delta far from a component leaves it byte-identical") {
    val triB = Seq(("b1", "b2"), ("b1", "b3"), ("b2", "b3"))
    val far = Seq(("f1", "f2"), ("f2", "f3"), ("f1", "f3"), ("f1", "f4"))
    val base = triB ++ far
    val delta = Seq(("f3", "f4"), ("f2", "f4")) // all delta mass on F
    val got = inc(base, delta, 3, 2)
    val batch = outOf(Graphs.kTrussEdges(frame(base ++ delta), 3, 2))
    assert(got == batch)
    assert(got.contains(("b1", "b2")), "B's triangle must persist untouched")
  }

  test("empty delta is a verbatim no-op") {
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val trace = Graphs.kTrussTrace(frame(tri), 3, 2)
    val out = Graphs.kTrussEdges(frame(tri), 3, 2)
    val got = outOf(Graphs.incrementalKTruss(trace, out, frame(tri),
      spark.emptyDataFrame.select(lit("x").as("a"), lit("y").as("b"))
        .where(lit(false)), 3, 2))
    assert(got == outOf(out.toDF("a", "b", "support")))
  }
}
