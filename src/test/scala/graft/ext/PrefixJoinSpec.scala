package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exactness of the prefix-filtered set-similarity join: unlike the LSH
  * pipelines (probabilistic recall), prefixJaccardPairs claims a COMPLETE
  * pair list — so the reference here is a brute-force all-pairs scan and
  * any missing pair is a bug. */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent in-memory brute force over string token sets. */
  private def brute(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, s) => id -> s.split(" ").toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (a, b)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] =
    Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"), "text", "doc_id", t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("complete vs brute force on a random templated corpus, several thresholds") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    // templated docs with mutations — dense near-dup structure like the
    // driver corpus, plus unrelated docs
    val base = Seq.tabulate(12)(_ => Seq.fill(8 + rnd.nextInt(10))(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs: Seq[(Long, String)] = Seq.tabulate(150) { i =>
      val txt =
        if (i % 3 == 0) base(rnd.nextInt(base.size))
        else {
          val b = base(rnd.nextInt(base.size)).split(" ").toBuffer
          if (b.nonEmpty && rnd.nextBoolean()) b(rnd.nextInt(b.size)) = vocab(rnd.nextInt(vocab.size))
          if (rnd.nextBoolean()) b += vocab(rnd.nextInt(vocab.size))
          b.mkString(" ")
        }
      (i.toLong, txt)
    }
    for (t <- Seq(0.5, 0.7, 0.9, 1.0)) {
      assert(run(docs, t) == brute(docs, t), s"threshold $t")
    }
  }

  test("identical docs, single-token docs, and threshold 1.0 corners") {
    val docs: Seq[(Long, String)] = Seq(
      (1L, "a b c"), (2L, "c b a"), (3L, "a"), (4L, "a"), (5L, "x y"),
      (6L, "a b c d"), (7L, "b c a a a")) // dup tokens collapse to the set
    val got = run(docs, 1.0)
    assert(got == Set((1L, 2L), (1L, 7L), (2L, 7L), (3L, 4L)))
    // threshold low enough to catch the subset pair {a,b,c} vs {a,b,c,d}
    assert(run(docs, 0.75).contains((1L, 6L)))
  }

  test("jaccard values match the exact division") {
    val docs: Seq[(Long, String)] = Seq((1L, "a b c d"), (2L, "a b c e"))
    val rows = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"), "text",
      "doc_id", 0.5).collect()
    assert(rows.length == 1)
    assert(rows.head.getDouble(2) == 0.6) // 3/5
  }

  /** Asymmetric brute force for containment |A∩B|/|A| >= t, a != b. */
  private def bruteContain(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, s) => id -> s.split(" ").toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      if (sa & sb).size.toDouble / sa.size >= t
    } yield (a, b)).toSet
  }

  test("containmentPairs: complete vs brute force; catches the quote pair Jaccard misses") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector.tabulate(50)(i => s"w$i")
    val docs: Seq[(Long, String)] = Seq.tabulate(120) { i =>
      val n = 3 + rnd.nextInt(12)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, body.mkString(" "))
    } ++ Seq((200L, "w1 w2 w3"), (201L, "w1 w2 w3 " + Vector.tabulate(20)(i => s"p$i").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.8, 1.0)) {
      val got = Dedup.containmentPairs(df, df, "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteContain(docs, t), s"threshold $t")
    }
    // the planted quote pair is found in the asymmetric direction only
    val got1 = Dedup.containmentPairs(df, df, "text", "doc_id", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1.contains((200L, 201L)) && !got1.contains((201L, 200L)))
    // ... and its Jaccard (3/23) is far below any near-dup threshold
    assert(!Dedup.prefixJaccardPairs(df, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet.contains((200L, 201L)))
  }

  test("probe-vs-corpus containment restricts the A side and matches the filtered brute force") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val docs: Seq[(Long, String)] = Seq.tabulate(90)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val probeIds = docs.map(_._1).filter(_ % 10 == 0).toSet
    val got = Dedup.containmentPairs(
        df.where($"doc_id" % 10 === 0), df, "text", "doc_id", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteContain(docs, 1.0).filter(p => probeIds(p._1)))
    // a probe token absent from the corpus: zero matches, no error
    val alien = Seq((500L, "zz1 zz2")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(alien, df, "text", "doc_id", 1.0).count() == 0)
  }

  test("shingle granularity (k=3) matches the LSH pipeline's verified pair list") {
    // q104's claim: same pairs as jaccardPairs (q26) wherever LSH recall
    // didn't get lucky — on this small corpus both must be the exact set
    val rnd = new scala.util.Random(53)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val base = Seq.tabulate(8)(_ => Seq.fill(10 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = Seq.tabulate(80) { i =>
      val b = base(i % base.size).split(" ").toBuffer
      if (rnd.nextBoolean()) b(rnd.nextInt(b.size)) = vocab(rnd.nextInt(vocab.size))
      (i.toLong, b.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val exact = Dedup.prefixJaccardPairs(df, "text", "doc_id", 0.5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.jaccardPairs(df, "text", "doc_id", 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(exact), "exact list must contain every LSH-found pair")
    assert(exact == lsh, "at this size LSH recall is ~1; any gap would be suspicious")
  }

  test("both joins are repartition-invariant (deterministic result sets)") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def rows(parts: Int) = {
      val df = docs.toDF("doc_id", "text").repartition(parts)
      (Dedup.prefixJaccardPairs(df, "text", "doc_id", 0.7)
         .collect().map(_.toSeq).toSet,
       Dedup.containmentPairs(df, df, "text", "doc_id", 0.9)
         .collect().map(_.toSeq).toSet)
    }
    assert(rows(2) == rows(13))
  }
}
