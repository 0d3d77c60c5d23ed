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
}
