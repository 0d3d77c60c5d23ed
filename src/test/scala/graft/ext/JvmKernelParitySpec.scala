package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** JVM kernel replicas pinned bit-equal to their Column forms — the
  * one-formula-two-runtimes discipline (BloomJoin.positionsJvm): the
  * streaming twins recompute inside StatefulProcessors with these, so a
  * drift here would silently break batch/stream reconciliation. */
class JvmKernelParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  test("quarterLog2Jvm == quarterLog2 Column over small, boundary, and huge values") {
    val xs = ((1L to 2000L) ++ Seq(16383L, 16384L, 16385L, 32767L, 32768L) ++
      (0 to 62).map(1L << _) ++ (1 to 62).map(b => (1L << b) - 1) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (Long.MaxValue / 2) + 1)).distinct
    val got = xs.toDF("x")
      .select(col("x"), TextAnalysis.quarterLog2(col("x")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) == TextAnalysis.quarterLog2Jvm(x), s"x=$x"))
  }

  test("isqrtJvm == isqrt Column over perfect squares, off-by-ones, and random longs") {
    val xs = ((0L to 3000L) ++
      (1L to 40L).flatMap { k => val s = k * k * 1000000L; Seq(s - 1, s, s + 1) } ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 61))).distinct
    val got = xs.toDF("x")
      .select(col("x"), Sampling.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val s = Sampling.isqrtJvm(x)
      assert(got(x) == s, s"x=$x")
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"not floor sqrt at x=$x")
    }
  }
}
