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
}
