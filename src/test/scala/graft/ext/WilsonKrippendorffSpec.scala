package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Evaluation.wilsonLowerBound]] and [[Evaluation.krippendorffAlpha]].
  * Wilson: JVM-replica equality, the ranking fix it exists for (1/1
  * ranks below 95/100 by the bound), monotonicity in n at fixed rate,
  * and the loud n > 6000 overflow rail. Krippendorff: hand-computed
  * perfect/mixed agreement, the Fleiss-vs-alpha small-N correction
  * (without-replacement De), the m-raters guard, and the De = 0 loud
  * failure. */
class WilsonKrippendorffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wilson(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Evaluation.wilsonLowerBound(rows.toDF("g", "n", "p"), "n", "p")
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap

  private def wilsonJvm(n: Long, p: Long): Long = {
    val s = BigInt(p) * (n - p) * 1000000000000L / n + 1000000000000L
    (((BigInt(p) + 2) * 1000000 - 2 * Sampling.isqrtDecJvm(s)) / (n + 4)).toLong
  }

  test("wilson: matches the JVM replica across a grid of counts") {
    val rows = for (n <- Seq(1L, 2L, 5L, 20L, 100L, 999L, 6000L); p <- Seq(0L, 1L, n / 2, n))
      yield (s"g$n-$p", n, p)
    val got = wilson(rows.distinct)
    rows.distinct.foreach { case (g, n, p) =>
      assert(got(g) == ((p * 1000000L / n, wilsonJvm(n, p))), s"$g")
    }
  }

  test("wilson: exact PAST the old n > 6000 long rail (decimal rails)") {
    // the pre-r13 long path raised at n > 6000 (p(n-p)*1e12 wrapped);
    // the decimal(38,0) rail must be bit-exact at billions of trials —
    // including n-p small, p small, and the n^2/4 worst-case radicand
    val rows = Seq(
      ("a", 6001L, 3000L), ("b", 1000000L, 999999L),
      ("c", 4000000000L, 2000000000L), ("d", 4000000000L, 1234567890L),
      ("e", 999999999999L, 499999999999L), ("f", 6000000000000L, 3000000000000L))
    val got = wilson(rows)
    rows.foreach { case (g, n, p) =>
      assert(got(g) == (((BigInt(p) * 1000000 / n).toLong, wilsonJvm(n, p))), s"$g")
    }
  }

  test("wilson: n > 6e12 fails loudly (the decimal(38,0) radicand rail)") {
    val ex = intercept[Exception] { wilson(Seq(("x", 6000000000001L, 3000L))) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("overflows"))
  }

  test("wilson: 1/1 ranks BELOW 95/100 by the lower bound (the fix it exists for)") {
    val got = wilson(Seq(("tiny", 1L, 1L), ("big", 100L, 95L)))
    assert(got("tiny")._1 > got("big")._1, "raw rate ranks tiny first (the bug)")
    assert(got("tiny")._2 < got("big")._2, "the bound must rank big first")
  }

  test("wilson: at fixed rate the bound rises with n toward the rate") {
    val got = wilson(Seq(("a", 10L, 8L), ("b", 100L, 80L), ("c", 1000L, 800L)))
    assert(got("a")._2 < got("b")._2 && got("b")._2 < got("c")._2)
    assert(got("c")._2 < 800000L, "the bound approaches the rate from below")
  }

  private def alpha(rows: Seq[(Long, String, String)], m: Int)
      : (Long, Long, Long, Long, Long) = {
    val r = Evaluation.krippendorffAlpha(rows.toDF("unit", "annotator", "label"), m)
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("krippendorff: hand case — 3 raters, half the units unanimous, half split 2-1") {
    // 4 units, labels x/y: u1,u2 unanimous x; u3,u4 split (x,x,y)
    val rows = Seq(
      (1L, "r1", "x"), (1L, "r2", "x"), (1L, "r3", "x"),
      (2L, "r1", "x"), (2L, "r2", "x"), (2L, "r3", "x"),
      (3L, "r1", "x"), (3L, "r2", "x"), (3L, "r3", "y"),
      (4L, "r1", "x"), (4L, "r2", "y"), (4L, "r3", "x"))
    val (nu, nn, doP, deP, a) = alpha(rows, 3)
    assert(nu == 4L && nn == 12L)
    // Do: disagreeing ordered pairs = 2 units x (3*2 - (2*1 + 0)) = 2*4 = 8
    //     over 4*3*2 = 24 -> 333333
    assert(doP == 8L * 1000000L / 24L)
    // De: N=12, Nx=10, Ny=2 -> 1e6 - (10*9 + 2*1)*1e6/(12*11) = 1e6 - 696969 = 303031
    assert(deP == 1000000L - (90L + 2L) * 1000000L / 132L)
    assert(a == 1000000L - doP * 1000000L / deP)
    assert(a < 0L, "observed disagreement above chance -> negative alpha here")
  }

  test("krippendorff: perfect agreement with mixed labels gives alpha = 1e6") {
    val rows = Seq(
      (1L, "r1", "x"), (1L, "r2", "x"),
      (2L, "r1", "y"), (2L, "r2", "y"),
      (3L, "r1", "x"), (3L, "r2", "x"))
    val (_, _, doP, deP, a) = alpha(rows, 2)
    assert(doP == 0L && deP > 0L && a == 1000000L)
  }

  test("krippendorff: a unit with the wrong rater count fails loudly") {
    val rows = Seq((1L, "r1", "x"), (1L, "r2", "x"), (2L, "r1", "y"))
    val ex = intercept[Exception] { alpha(rows, 2) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("annotations"))
  }

  test("krippendorff: all annotations identical fails loudly (De = 0, alpha undefined)") {
    val rows = Seq((1L, "r1", "x"), (1L, "r2", "x"), (2L, "r1", "x"), (2L, "r2", "x"))
    val ex = intercept[Exception] { alpha(rows, 2) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("undefined"))
  }

  test("krippendorff: EMPTY input fails loudly, not a silent NULL row") {
    val ex = intercept[Exception] { alpha(Seq.empty[(Long, String, String)], 2) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("empty input"))
  }
}
