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

  test("tokenEntropy: uniform distribution hits log2(vocab) exactly; constant text scores 0") {
    import spark.implicits._
    // 8 distinct tokens, each exactly 4 times -> H = 3 bits, representable
    // exactly on the quarter-bit grid (powers of two are exact in quarterLog2)
    val uniform = (0 until 4).map(_ => (0 until 8).map(i => s"t$i").mkString(" "))
    val constant = Seq.fill(5)("x x x x")
    val df = (uniform.map(("u", _)) ++ constant.map(("c", _))).toDF("src", "text")
    val got = TextAnalysis.tokenEntropy(df, "src", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    assert(got("u") == ((32L, 8L, 3.0)))
    assert(got("c") == ((20L, 1L, 0.0)))
  }

  test("gopherRules: each rule flips on its own hand-built violation") {
    import spark.implicits._
    val good = ("the of" +: (1 to 58).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      (1L, good), // passes all
      (2L, "short doc the of"), // wc_ok fails
      (3L, (1 to 60).map(_ => "ab").mkString(" ")), // wordlen + stopwords fail (len 2)
      (4L, (1 to 60).map(i => s"$i${i}99").mkString(" ") + " the of"), // alpha fails
      (5L, Seq.fill(60)("the").mkString(" ") + " of") // ttr fails
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7))).toMap
    assert(got(1L)._6, "doc 1 keeps")
    assert(!got(2L)._1 && !got(2L)._6, "doc 2 fails word count")
    assert(!got(3L)._2, "doc 3 fails mean word length")
    assert(!got(4L)._3 && !got(4L)._6, "doc 4 fails alpha fraction")
    assert(!got(5L)._5 && !got(5L)._6, "doc 5 fails TTR floor")
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

  test("vocabularyRichness: hand-computed chao1 + Good-Turing; f2=0 stays defined") {
    import spark.implicits._
    // group g1: tokens a a b c  -> N=4 S=3 f1=2 (b,c) f2=1 (a)
    //   chao1 = 3 + 2*1/(2*2) = 3 + 0 (trunc 2/4) = 3; gt = 2e6/4 = 500000
    // group g2: all singletons a b c -> f1=3 f2=0
    //   chao1 = 3 + 3*2/(2*1) = 6; gt = 1000000 (every token unseen-mass)
    val docs = Seq(("g1", "a a b"), ("g1", "c"), ("g2", "a b c"))
      .toDF("src", "text")
    val got = TextAnalysis.vocabularyRichness(docs, "src", "text")
      .orderBy(col("grp")).collect()
    val g1 = got(0); val g2 = got(1)
    assert(g1.getString(0) == "g1" && g1.getLong(1) == 4L && g1.getLong(2) == 3L)
    assert(g1.getLong(3) == 2L && g1.getLong(4) == 1L)
    assert(g1.getLong(5) == 3L && g1.getLong(6) == 500000L)
    assert(g2.getLong(3) == 3L && g2.getLong(4) == 0L)
    assert(g2.getLong(5) == 6L && g2.getLong(6) == 1000000L)
  }

  test("incrementalTokenCounts: maintained frame ≡ one-shot across 3 wave schedules") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0L until 60L).map(i => (i, s"s${i % 3}",
      Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val all = docs.toDF("doc_id", "src", "text")
    val batch = TextAnalysis.richnessFromCounts(
      TextAnalysis.tokenCounts(all, "src", "text"))
      .collect().map(_.toString).sorted.toSeq
    Seq(2L, 7L, 13L).foreach { h =>
      var counts = TextAnalysis.tokenCounts(
        all.where(col("doc_id") * h % 4 === 0), "src", "text")
        .localCheckpoint(true)
      (1L to 3L).foreach { wv =>
        counts = TextAnalysis.incrementalTokenCounts(counts,
          all.where(col("doc_id") * h % 4 === wv), "src", "text")
          .localCheckpoint(true)
      }
      val got = TextAnalysis.richnessFromCounts(counts.where(col("c") > 0))
        .collect().map(_.toString).sorted.toSeq
      assert(got == batch, s"schedule x$h diverged")
    }
  }
}
