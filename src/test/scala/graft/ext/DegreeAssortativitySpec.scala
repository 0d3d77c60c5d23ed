package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.degreeAssortativity]] — exact rational Pearson over
  * symmetric endpoint degrees. Pins the hand-computed star (maximally
  * disassortative among its rows), a JVM BigInt replica on random
  * graphs, orientation/duplication invariance, and the loud
  * zero-variance failure on regular graphs. */
class DegreeAssortativitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): (Long, Long) = {
    val r = Graphs.degreeAssortativity(edges.toDF("a", "b")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  private def replica(edges: Seq[(String, String)]): (Long, Long) = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val deg = sym.groupBy(_._1).map { case (n, xs) => n -> BigInt(xs.size) }
    val m = BigInt(sym.size)
    val sx = sym.map(e => deg(e._1)).sum
    val sxx = sym.map(e => deg(e._1) * deg(e._1)).sum
    val sxy = sym.map(e => deg(e._1) * deg(e._2)).sum
    val num = m * sxy - sx * sx
    val den = m * sxx - sx * sx
    // floor division via the +1e6*den shift (num may be negative)
    val r = (BigInt(1000000) * num + BigInt(1000000) * den) / den - 1000000
    (sym.size.toLong, r.toLong)
  }

  test("star: hand-computed disassortativity") {
    // center c with 4 leaves: every edge pairs deg 4 with deg 1
    val edges = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"), ("c", "l4"))
    val (mSym, r) = run(edges)
    assert(mSym == 8L)
    assert((mSym, r) == replica(edges))
    assert(r == -1000000L, s"a pure star is perfectly disassortative: $r")
  }

  test("random graphs equal the BigInt replica (floor semantics on negatives included)") {
    val rnd = new scala.util.Random(101)
    for (trial <- 1 to 4) {
      val edges = Seq.fill(90)((s"n${rnd.nextInt(16)}", s"n${rnd.nextInt(16)}"))
        .filter(e => e._1 != e._2).distinct
      val got = run(edges)
      assert(got == replica(edges), s"trial $trial")
    }
  }

  test("orientation and duplication are canonicalized by the sym-distinct") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    assert(run(e) == run(e ++ e.map(_.swap) ++ e))
  }

  test("degree-regular graph fails loudly (zero variance, r undefined)") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val ex = intercept[Exception] { run(cycle) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("undefined"))
  }
}
