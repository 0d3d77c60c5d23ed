package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Source-level overlap matrix + LSH recall audit: identities a correct
  * implementation must hit exactly (duplicate sources at ppm=10^6,
  * disjoint at 0; j=1 pairs can never be missed by any band config). */
class CorpusOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sourceSimilarityMatrix: duplicate sources 10^6 ppm, disjoint 0, partial exact") {
    val docs = Seq(
      (1L, "a b c d e f", "s1"),
      (2L, "a b c d e f", "s2"), // s2 == s1 gram-for-gram
      (3L, "x y z w v u", "s3"), // s3 disjoint from s1/s2
      (4L, "a b c d q r", "s4")  // s4 shares grams "a b c", "b c d" with s1/s2
    ).toDF("doc_id", "text", "source")
    val m = CorpusStats.sourceSimilarityMatrix(docs, "text", "source", k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(m.size == 6, "complete upper triangle over 4 sources")
    assert(m(("s1", "s2")) == (4L, 4L, 4L, 1000000L), "identical sources")
    assert(m(("s1", "s3"))._4 == 0L && m(("s1", "s3"))._3 == 0L, "disjoint sources")
    // s1 grams: {abc,bcd,cde,def}; s4 grams: {abc,bcd,cdq,dqr}; inter=2, union=6
    assert(m(("s1", "s4")) == (4L, 4L, 2L, 333333L), "partial overlap exact ppm")
  }

  test("lshRecallAudit: j=1 pairs always found; recall_ppm bounded and consistent") {
    // ten identical docs (j=1 pairs, identical signatures) + unrelated noise
    val docs = ((0 until 10).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (10 until 30).map(i => (i.toLong, s"tok${i}a tok${i}b tok${i}c tok${i}d"))).toDF("doc_id", "text")
    val audit = Dedup.lshRecallAudit(docs, "text", "doc_id",
        threshold = 0.5, k = 1, numHashes = 16, r = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // only decile 9 exists here: the 45 identical pairs, all found
    assert(audit.keySet == Set(9L))
    assert(audit(9L) == (45L, 45L, 1000000L),
      "identical docs share every band bucket — zero misses possible")
  }
}
