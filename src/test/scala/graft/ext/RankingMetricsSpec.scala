package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Evaluation.spearmanRho]] / [[Evaluation.rankBiasedOverlap]] /
  * [[Evaluation.mapMrrAtK]] / [[Evaluation.mcnemar]] — closed-form and
  * hand-computed pins for the round-14 ranking/eval additions. */
class RankingMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("spearman: monotone agreement = 1, reversal = -1, exact tie case") {
    val up = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 3.0, 30.0), (4L, 4.0, 35.0))
    assert(Evaluation.spearmanRho(up.toDF("id", "x", "y")).head.getDouble(1) == 1.0)
    val down = up.map { case (i, x, y) => (i, x, -y) }
    assert(Evaluation.spearmanRho(down.toDF("id", "x", "y")).head.getDouble(1) == -1.0)
    // hand case with ties: x = (1,2,2,3), y = (10,30,20,40)
    // r2x = (2, 5, 5, 8); r2y = (2, 6, 4, 8)
    // n=4 sx=20 sy=20 sxy=118 sxx=118 syy=120
    // rho = (4*118-400)/sqrt((4*118-400)*(4*120-400)) = 72/sqrt(72*80)
    val tied = Seq((1L, 1.0, 10.0), (2L, 2.0, 30.0), (3L, 2.0, 20.0), (4L, 3.0, 40.0))
    val got = Evaluation.spearmanRho(tied.toDF("id", "x", "y")).head.getDouble(1)
    assert(math.abs(got - 72.0 / math.sqrt(72.0 * 80.0)) < 1e-15)
    // constant axis raises loudly
    val const = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0))
    intercept[Exception] {
      Evaluation.spearmanRho(const.toDF("id", "x", "y")).collect()
    }
  }

  test("rbo: identical top-10 lists = 1 - 0.9^10; disjoint lists = 0") {
    val scores = (1L to 20L).map(i => (i, (100 - i).toDouble, (100 - i).toDouble))
    val row = Evaluation.rankBiasedOverlap(
      scores.toDF("id", "sa", "sb"), "id", "sa", "sb", 10).head
    assert(row.getLong(1) == 10L)
    assert(row.getLong(2) == 651321L) // floor(10^6 * (1 - 0.9^10))
    // disjoint: A ranks 1..10 high on ids 1-10, B on ids 11-20
    val disj = (1L to 20L).map(i =>
      (i, if (i <= 10) (100 - i).toDouble else 0.0,
        if (i > 10) (100 - i).toDouble else 0.0))
    val drow = Evaluation.rankBiasedOverlap(
      disj.toDF("id", "sa", "sb"), "id", "sa", "sb", 10).head
    assert(drow.getLong(1) == 0L && drow.getLong(2) == 0L)
  }

  test("rbo coefficients: scaled-integer identity reproduces (1-p)*sum p^(d-1)*ov_d/d") {
    // perturb ranks 9/10 in B (ids 10 and 9 land at ranks 9 and 10 via
    // the id tie-break with id8): ov_d = d for d in 1..8 and d = 10;
    // ov_9 = 8. EXACT reference via the per-DEPTH decomposition (the
    // operator sums per-ITEM coefficients — a different factorization
    // of the same rational): ppm = floor(10^6 * Σ ov_d·9^{d-1}·
    // 10^{10-d}·(2520/d) / (10^10·2520))
    val num = (1 to 10).map { d =>
      val ov = if (d == 9) 8L else d.toLong
      ov * BigInt(9).pow(d - 1) * BigInt(10).pow(10 - d) * (2520L / d)
    }.sum
    val expected = (num * 1000000 / (BigInt(10).pow(10) * 2520)).toLong
    val scores = (1L to 20L).map { i =>
      val sa = (100 - i).toDouble
      val sb = if (i == 9L) 91.0 else if (i == 10L) 92.0 else sa
      (i, sa, sb)
    }
    val row = Evaluation.rankBiasedOverlap(
      scores.toDF("id", "sa", "sb"), "id", "sa", "sb", 10).head
    assert(row.getLong(2) == expected)
  }

  test("map/mrr: hand-computed fixture, missing-query zero, undefined exclusion") {
    // q1: rel at ranks 1,3 with R=2 -> AP = (1 + 2/3)/2 = 5/6; RR = 1
    // q2: no rel in top-10, R=4      -> AP = 0; RR = 0
    // q3: R=0                        -> excluded, counted undefined
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 0L), (1L, 3, 1L),
      (2L, 1, 0L), (2L, 2, 0L))
    val totals = Seq((1L, 2L), (2L, 4L), (3L, 0L))
    val row = Evaluation.mapMrrAtK(
      ranked.toDF("qid", "rank", "rel"), totals.toDF("qid", "r_total"), 10).head
    assert(row.getLong(0) == 2L) // n_queries
    assert(row.getLong(1) == 1L) // n_undefined
    assert(row.getLong(2) == 416666L) // (833333 + 0) div 2
    assert(row.getLong(3) == 500000L) // (10^6 + 0) / 2
  }

  test("prCurve: hand-computed counts, NULL precision at an empty cutoff, recall monotone") {
    // scores: pos at 0.9, 0.6; neg at 0.8, 0.1
    val scored = Seq((0.9, 1L), (0.6, 1L), (0.8, 0L), (0.1, 0L))
      .toDF("score", "pos")
    val rows = Evaluation.prCurve(scored, Seq(0, 7000, 8500, 9500))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(rows(0) == ((2L, 2L, 0L, Some(500000L), Some(1000000L))))
    assert(rows(7000) == ((1L, 1L, 1L, Some(500000L), Some(500000L))))
    assert(rows(8500) == ((1L, 0L, 1L, Some(1000000L), Some(500000L))))
    // nothing clears 0.95: precision NULL (no operating point), recall 0
    assert(rows(9500) == ((0L, 0L, 2L, None, Some(0L))))
    // recall never increases as the threshold rises
    val recalls = Evaluation.prCurve(scored, Seq(0, 7000, 8500, 9500))
      .orderBy(col("theta_bp")).collect().map(r => r.getLong(1) + r.getLong(3))
    assert(recalls.toSet.size == 1) // tp + fn constant: denominator fixed
  }

  test("mcnemar: exact chi2 ppm and the loud b+c=0 raise") {
    // b=5, c=2 -> chi2 = 9/7 -> 1285714 ppm
    val d = (Seq.fill(5)((1L, 0L)) ++ Seq.fill(2)((0L, 1L)) ++
      Seq.fill(3)((1L, 1L))).toDF("a_ok", "b_ok")
    val row = Evaluation.mcnemar(d, "a_ok", "b_ok").head
    assert(row.getLong(0) == 10L && row.getLong(1) == 5L && row.getLong(2) == 2L)
    assert(row.getLong(3) == 1285714L)
    val agree = Seq((1L, 1L), (0L, 0L)).toDF("a_ok", "b_ok")
    intercept[Exception] { Evaluation.mcnemar(agree, "a_ok", "b_ok").collect() }
  }
}
