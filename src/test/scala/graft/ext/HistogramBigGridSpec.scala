package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The decimal(38,0) `bigGrid` escape hatch for the grid-KS family:
  * (a) on in-range counts the wide path is BIT-identical to the long
  * path, so flipping the switch never changes an answer that was already
  * representable; (b) on counts whose cross-products straddle 2^63 the
  * wide path matches an exact BigInteger replay while the long path
  * overflows (ANSI throws) — the documented caveat is now a tested
  * boundary, not a comment. */
class HistogramBigGridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ksDrift: bigGrid path agrees bit-exactly with the long path in range") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)((s"g${rnd.nextInt(4)}", rnd.nextDouble() * 8))
    val df = rows.toDF("grp", "v")
    def run(big: Boolean) =
      Histogram.ksDrift(df, col("grp"), col("v"), 16, bigGrid = big)
        .select(col("grp"), col("n").cast("string"),
          col("ks_scaled").cast("string"), col("ks"))
        .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(run(big = true) == run(big = false))
  }

  test("weeklyKsDrift: bigGrid path agrees bit-exactly with the long path in range") {
    val rnd = new scala.util.Random(19)
    val wk = 7L * 24 * 3600 * 1000000000L
    val rows = Seq.fill(600)((s"g${rnd.nextInt(3)}",
      rnd.nextDouble() * 4, rnd.nextInt(4) * wk + rnd.nextInt(1000000).toLong))
    val df = rows.toDF("grp", "v", "ts")
    def run(big: Boolean) =
      Histogram.weeklyKsDrift(df, col("grp"), col("v"), "ts", 16, bigGrid = big)
        .select(col("grp"), col("wk"), col("n_cur").cast("string"),
          col("n_prev").cast("string"), col("ks_scaled").cast("string"), col("ks"))
        .orderBy("grp", "wk").collect().map(_.toSeq).toSeq
    assert(run(big = true) == run(big = false))
  }

  // synthetic bin counts near Long.Max: cum·n_rest products reach ~1.2e37,
  // 650 bits past the long range but inside decimal(38,0)
  private val boundaryBins = Seq(
    ("a", 0L, 4000000000000000000L), ("a", 1L, 4000000000000000000L),
    ("b", 0L, 1000000000000000000L), ("b", 2L, 2000000000000000000L))

  test("ksDriftFromBins bigGrid matches a BigInteger replay on counts straddling 2^63") {
    val bins = boundaryBins.toDF("grp", "bin", "cnt")
    val got = Histogram.ksDriftFromBins(bins, bigGrid = true)
      .select(col("grp"), col("n").cast("string"), col("ks_scaled").cast("string"))
      .orderBy("grp").collect().map(r => (r.getString(0), BigInt(r.getString(1)),
        BigInt(r.getString(2)))).toSeq
    // exact replay: dense CDFs over the union of occupied bins
    val allBins = boundaryBins.map(_._2).distinct.sorted
    val byGrp = boundaryBins.groupBy(_._1)
    val nAll = boundaryBins.map(b => BigInt(b._3)).sum
    val want = byGrp.toSeq.sortBy(_._1).map { case (g, rows) =>
      val cnt = rows.map(r => r._2 -> BigInt(r._3)).toMap.withDefaultValue(BigInt(0))
      val nG = rows.map(r => BigInt(r._3)).sum
      val restCnt = boundaryBins.filterNot(_._1 == g)
        .groupBy(_._2).map { case (b, rs) => b -> rs.map(r => BigInt(r._3)).sum }
        .withDefaultValue(BigInt(0))
      var (cumG, cumR, sup) = (BigInt(0), BigInt(0), BigInt(0))
      for (b <- allBins) {
        cumG += cnt(b); cumR += restCnt(b)
        val d = (cumG * (nAll - nG) - cumR * nG).abs
        if (d > sup) sup = d
      }
      (g, nG, sup)
    }
    assert(got == want)
    // and every sup really is past the long range — the boundary is real
    assert(want.forall(_._3 > BigInt(Long.MaxValue)))
  }

  test("the long path overflows on the same boundary input (ANSI arithmetic error)") {
    val bins = boundaryBins.toDF("grp", "bin", "cnt")
    val e = intercept[Exception] {
      Histogram.ksDriftFromBins(bins, bigGrid = false)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] ||
      String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
      s"expected an overflow, got: $e")
  }
}
