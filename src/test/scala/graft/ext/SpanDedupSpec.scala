package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exactness of the repeated-span profile: spanDupProfile claims exact
  * duplicated-span detection and exact maximal-region merging, so the
  * reference is an independent in-memory brute force (span multiset ->
  * duplicated set -> interval union) and any divergence is a bug. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (doc_id -> (n_tokens, dup_spans, dup_regions, dup_tokens)). */
  private def brute(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long, Long)] = {
    val spans = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < k) Seq.empty
      else (0 to toks.length - k).map(i => (id, i, toks.slice(i, i + k).mkString(" ")))
    }
    val counts = spans.groupBy(_._3).map { case (s, occ) => s -> occ.size }
    val flagged = spans.filter(s => counts(s._3) >= 2).groupBy(_._1)
    docs.map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      flagged.get(id) match {
        case None => id -> ((n, 0L, 0L, 0L))
        case Some(occ) =>
          val pos = occ.map(_._2).sorted
          // merge [p, p+k-1] intervals; new region when gap > k
          val regions = pos.tail.foldLeft(List((pos.head, pos.head))) {
            case ((s0, e0) :: rest, p) =>
              if (p - e0 <= k) (s0, p) :: rest else (p, p) :: (s0, e0) :: rest
            case (Nil, p) => List((p, p))
          }
          val covered = regions.map { case (s0, e0) => e0 - s0 + k }.sum.toLong
          id -> ((n, pos.size.toLong, regions.size.toLong, covered))
      }
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long, Long)] =
    Dedup.spanDupProfile(docs.toDF("doc_id", "text"), "text", "doc_id", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("crafted corpus: cross-doc passage, within-doc repeat, short docs, merges") {
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val docs: Seq[(Long, String)] = Seq(
      // shares the 10-token passage with doc 1 -> one region of 10 tokens at k=8
      (0L, s"a1 a2 a3 $passage a4 a5"),
      (1L, s"b1 b2 $passage b3 b4 b5 b6"),
      // within-doc repetition: the same 8 tokens twice, non-overlapping
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 x1 x2 x3 c1 c2 c3 c4 c5 c6 c7 c8"),
      // shorter than k: always zero
      (3L, "d1 d2 d3"),
      // no duplication
      (4L, (1 to 30).map(i => s"u$i").mkString(" ")),
    )
    val got = run(docs, 8)
    assert(got == brute(docs, 8))
    assert(got(3L) == ((3L, 0L, 0L, 0L)))
    assert(got(4L)._2 == 0L)
    assert(got(0L)._4 == 10L && got(0L)._3 == 1L) // one merged 10-token region
  }

  test("random templated corpus matches brute force at several k") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(25)(i => s"w$i")
    val base = Seq.tabulate(6)(_ => Seq.fill(12 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs: Seq[(Long, String)] = Seq.tabulate(80) { i =>
      val txt =
        if (i % 4 == 0) base(rnd.nextInt(base.size))
        else Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ") +
          (if (rnd.nextBoolean()) " " + base(rnd.nextInt(base.size)) else "")
      (i.toLong, txt)
    }
    for (k <- Seq(3, 5, 8)) assert(run(docs, k) == brute(docs, k), s"k=$k")
  }
}
