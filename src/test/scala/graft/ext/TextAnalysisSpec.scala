package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Text-analysis operator units. The oracle-backed q31/q32/q33 cover the
  * `documents` table; these cover column-independence (the operators must
  * work for ANY column expression, not just one named `text`). */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stopwordRatio follows the passed column, not a hardcoded name") {
    import spark.implicits._
    val df = Seq("the cat and dog", "xyz qrs").toDF("body")
    val ratios = df.select(TextAnalysis.stopwordRatio(col("body")).as("r"))
      .as[Double].collect().toList
    assert(ratios == List(0.5, 0.0))
    // also resolvable on a derived expression
    val derived = df.select(
      TextAnalysis.stopwordRatio(concat_ws(" ", col("body"), lit("of"))).as("r"))
      .as[Double].collect().toList
    assert(derived == List(0.6, 1.0 / 3.0))
  }

  test("subwordTokenCount: runs and symbols, empty-safe") {
    import spark.implicits._
    val got = Seq("", "  ", "a1b2", "don't stop", "x!!!")
      .toDF("t")
      .select(TextAnalysis.subwordTokenCount(col("t")).as("n"))
      .as[Int].collect().toList
    // "a1b2" -> a,1,b,2; "don't stop" -> don,',t,stop; "x!!!" -> x,!,!,!
    assert(got == List(0, 0, 4, 4, 4))
  }

  test("qualityScore works on a column of any name") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("payload")
    val q = df.select(TextAnalysis.qualityScore(col("payload"),
      TextAnalysis.tokenCount(col("payload"))).as("q")).as[Double].head()
    assert(q > 0.0 && q <= 1.0)
  }

  test("quarterLog2: exact floor(log2(x^4)) below 2^15; bounded + monotone above") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val small = Seq.tabulate(300)(_ => 1L + rnd.nextInt((1 << 15) - 1))
    val big = Seq.tabulate(300)(_ => math.abs(rnd.nextLong()) % (1L << 50) + (1L << 15))
    val edges = Seq(1L, 2L, 3L, (1L << 14) - 1, 1L << 14, (1L << 15) - 1,
      1L << 15, (1L << 15) + 1, 1L << 40)
    val xs = (small ++ big ++ edges).distinct.sorted
    val got = xs.toDF("x").select(TextAnalysis.quarterLog2(col("x")))
      .as[Long].collect()
    val byX = xs.zip(got).toMap
    for (x <- xs) {
      val exact = 4.0 * (math.log(x.toDouble) / math.log(2.0))
      if (x < (1L << 15)) {
        // exact quarter-bit floor: floor(log2(x^4)) via BigInt bit length
        val want = BigInt(x).pow(4).bitLength - 1
        assert(byX(x) == want, s"x=$x")
      } else {
        // truncation under-reads by < 4*2^-14 quarter-bits + the floor
        assert(byX(x) <= exact + 1e-9 && byX(x) >= exact - 1.01, s"x=$x got=${byX(x)} vs $exact")
      }
    }
    // monotone in x
    assert(xs.map(byX).sliding(2).forall(p => p.head <= p.last))
  }
}
