package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Sequence chunking/packing units (q50/q51). */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chunkTokens splits on the budget with a correct tail") {
    import spark.implicits._
    // 7 tokens, budget 3 -> chunks of 3,3,1
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, "text", "doc_id", 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toList == List((0L, 3L), (1L, 3L), (2L, 1L)))
  }

  test("chunk fingerprints equal the md5 of the corresponding token slice") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, "text", "doc_id", 3)
      .orderBy("chunk_id").select("chunk_md5").as[String].collect()
    val want = Seq("a b c", "d e").map(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(got.toList == want.toList)
  }

  test("a doc shorter than the budget is one chunk; doc count preserved") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "p q r s")).toDF("doc_id", "text")
    val chunks = Packing.chunkTokens(docs, "text", "doc_id", 16)
    assert(chunks.count() == 2)
    assert(chunks.agg(sum("chunk_tokens")).head.getLong(0) == 6L)
  }

  test("packBins fills bins in order and conserves tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "t1 t2 t3 t4 t5"), (2L, "a", "u1 u2 u3"), (3L, "a", "v1 v2 v3 v4"),
      (4L, "b", "w1 w2")).toDF("doc_id", "grp", "text")
    val chunks = Packing.chunkTokens(docs, "text", "doc_id", 4)
      .join(docs.select(col("doc_id"), col("grp")), "doc_id")
    val bins = Packing.packBins(chunks, col("grp"), 6)
      .orderBy("grp", "bin_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // group a chunks in order: 4,1 (doc1), 3 (doc2), 4 (doc3) — cum 4,5,8,12
    // bins: before=0->b0, 4->b0, 5->b0, 8->b1 ; group b: 2 tokens -> b0
    assert(bins.toList == List(("a", 0L, 3L, 8L), ("a", 1L, 1L, 4L), ("b", 0L, 1L, 2L)))
    val total = bins.filter(_._1 == "a").map(_._4).sum
    assert(total == 12L)
  }

  test("strideChunks: full coverage, fixed overlap, no redundant tail") {
    import spark.implicits._
    // lengths straddling the boundary cases: < window, == window,
    // == window+1 (forces a short but non-contained tail), long
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),    // n=5  <= w -> 1 chunk
      (2L, (1 to 8).map(i => s"w$i").mkString(" ")),    // n=8  == w -> 1 chunk
      (3L, (1 to 9).map(i => s"w$i").mkString(" ")),    // n=9 -> starts 0,6
      (4L, (1 to 25).map(i => s"w$i").mkString(" "))    // n=25 -> 0,6,12,18
    ).toDF("doc_id", "text")
    val w = 8; val st = 6
    val got = Packing.strideChunks(docs, "text", "doc_id", w, st)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val lens = Map(1L -> 5, 2L -> 8, 3L -> 9, 4L -> 25)
    lens.foreach { case (id, n) =>
      val cs = got(id).sortBy(_._2)
      val expected = if (n <= w) 1 else (n - w + st - 1) / st + 1
      assert(cs.length == expected, s"doc $id chunk count")
      cs.zipWithIndex.foreach { case ((_, cid, start, ct), i) =>
        assert(cid == i && start == i.toLong * st, s"doc $id chunk $i start")
        assert(ct == math.min(w, n - start), s"doc $id chunk $i len")
      }
      // coverage: last chunk reaches the final token
      val (_, _, ls, lt) = cs.last
      assert(ls + lt == n, s"doc $id tail coverage")
      // no chunk fully contained in its predecessor
      cs.toSeq.sliding(2).foreach {
        case Seq((_, _, s1, t1), (_, _, s2, t2)) =>
          assert(s2 + t2 > s1 + t1, s"doc $id redundant tail")
        case _ =>
      }
    }
  }
}
