package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exactness of winnowing fingerprints: the operator claims the robust
  * winnowing selection rule (per-window min, rightmost on ties) over
  * md5-derived 40-bit gram hashes, so the reference is an independent
  * in-memory brute force of exactly that rule — plus the paper's coverage
  * guarantee (a shared run of >= w+k-1 words forces a shared fingerprint)
  * checked constructively. */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Robust winnowing, straight from the definition. */
  private def brute(text: String): Set[(Long, Long)] = {
    val toks = text.split(" ", -1)
    if (toks.length < K) return Set.empty
    val grams = (0 to toks.length - K).map(i => toks.slice(i, i + K).mkString(" "))
    if (grams.length < W) return Set.empty
    val hs = grams.map(g => md5h60(g) % (1L << 40))
    (0 to grams.length - W).map { j =>
      val (h, p) = (j until j + W).map(p => (hs(p), p)).minBy { case (h, p) => (h, -p) }
      (h, p.toLong)
    }.toSet
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"), "text", "doc_id", K, W)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }

  test("crafted corpus parity: shared passage, in-window hash ties, short docs") {
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val docs: Seq[(Long, String)] = Seq(
      1L -> s"alpha beta gamma $passage delta epsilon zeta",
      2L -> s"one two three four five $passage six seven",
      // identical grams inside one window ("a b a b ..." repeats the same
      // 4-gram) force hash ties — the rightmost-position rule must decide
      3L -> "a b a b a b a b a b a b",
      4L -> "too short",          // < k tokens: no grams
      5L -> "just five tokens in", // k tokens but < w grams
      6L -> "x y z w v u t s r q p o n m l")
    val got = run(docs)
    for ((id, text) <- docs) {
      val want = brute(text)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
  }

  test("coverage guarantee: a shared w+k-1 word run yields a shared fingerprint") {
    val shared = (1 to (W + K - 1)).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      10L -> s"u1 u2 u3 u4 u5 $shared u6 u7 u8 u9",
      20L -> s"v1 v2 $shared v3 v4 v5 v6 v7 v8 v9 v10")
    val fps = Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"), "text", "doc_id", K, W)
    val pairs = Dedup.winnowingOverlapPairs(fps, maxDocFreq = 50, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((10L, 20L)))
  }

  test("overlap pairs: shared counts exact vs brute sets; stoplist drops common fps") {
    val passage = (1 to 20).map(i => s"q$i").mkString(" ")
    val base: Seq[(Long, String)] = Seq(
      1L -> s"a1 a2 a3 $passage a4 a5",
      2L -> s"b1 b2 $passage b3 b4 b5")
    // plant the SAME text in 60 more docs -> every fingerprint of it sits in
    // >50 docs and must be stoplisted away entirely
    val common = (100L until 160L).map(i => i -> s"c1 c2 c3 $passage c4 c5")
    val docs = base ++ common

    val fps = Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"), "text", "doc_id", K, W)
    val got = Dedup.winnowingOverlapPairs(fps, maxDocFreq = 50, minShared = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    // brute expected: pairwise |fp-set intersection| AFTER dropping fps in >50 docs
    val sets = docs.map { case (id, t) => id -> brute(t).map(_._1) }.toMap
    val docFreq = sets.values.toSeq.flatMap(_.toSeq).groupBy(identity).map { case (h, o) => h -> o.size }
    val kept = sets.map { case (id, s) => id -> s.filter(h => docFreq(h) <= 50) }
    val ids = docs.map(_._1)
    val want = (for {
      a <- ids; b <- ids if a < b
      n = (kept(a) intersect kept(b)).size if n >= 1
    } yield (a, b) -> n.toLong).toMap
    assert(got === want)
  }
}
