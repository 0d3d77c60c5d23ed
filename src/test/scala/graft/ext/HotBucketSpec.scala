package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The LSH hot-bucket skew guard ([[Dedup.guardedBucketPairs]]): an
  * adversarial constant-document corpus (every doc identical → one giant
  * bucket in EVERY band) must stay sub-quadratic; small buckets keep exact
  * all-pairs semantics; clustering consumers still see the full component;
  * plans stay cartesian/BNLJ-free; and the audit query names what was
  * split. */
class HotBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val boilerplate =
    "the quick brown fox jumps over the lazy dog again and again forever"

  /** n identical docs + a few distinct ones. */
  private def adversarialCorpus(n: Int) = {
    val dups = (0 until n).map(i => (i.toLong, boilerplate))
    val distinctDocs = Seq(
      (n + 0L, "completely different text about spark catalyst optimizer internals"),
      (n + 1L, "another unrelated document mentioning parquet row group statistics"))
    (dups ++ distinctDocs).toDF("doc_id", "text")
  }

  test("constant-document corpus stays sub-quadratic under the cap") {
    val n = 500
    val docs = adversarialCorpus(n)
    val sigs = Dedup.minhashSignatures(
      Dedup.hashedShingleSets(docs, "text", "doc_id"))
    val capped = Dedup.lshCandidatePairs(sigs, maxBucketSize = 16)
    val cnt = capped.count()
    // every band's bucket of 500 star-splits to 499 hub pairs; all bands
    // produce the SAME hub pairs, so the distinct candidate set is n-1 —
    // versus n(n-1)/2 = 124,750 uncapped
    assert(cnt == (n - 1).toLong, s"expected ${n - 1} hub pairs, got $cnt")
    // linear bound, explicitly: far below quadratic
    assert(cnt < 4L * n, s"candidate count $cnt is not sub-quadratic for n=$n")
  }

  test("guard preserves clustering: all identical docs land in one component") {
    val n = 200
    val docs = adversarialCorpus(n)
    // full pipeline with a tiny cap: candidates -> exact-Jaccard verify -> CC
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 0.5, maxBucketSize = 8)
    val cc = Dedup.connectedComponents(pairs)
    val roots = cc.groupBy(col("root")).count().collect()
    assert(roots.length == 1, s"expected one component, got ${roots.length}")
    assert(roots(0).getLong(0) == 0L && roots(0).getLong(1) == n.toLong)
  }

  test("small buckets keep exact all-pairs semantics (cap not hit == uncapped)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairSet(maxBucket: Int) =
      Dedup.jaccardPairs(docs, "text", "doc_id", 0.5, maxBucketSize = maxBucket)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.DefaultMaxBucketSize) == pairSet(Int.MaxValue))
  }

  test("embedding LSH guard: constant-vector corpus stays sub-quadratic, pairs reach the hub") {
    val n = 300
    val vec = (0 until 64).map(i => 0.1f + 0.01f * i)
    val dups = (0 until n).map(i => (i.toLong, vec))
    val other = Seq((n.toLong, (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f)))
    val emb = (dups ++ other).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairsLsh(
      emb, "embedding", "vec_id", 0.9, maxBucketSize = 16)
    val got = pairs.collect()
    // every identical vector pairs with the hub (vec 0) at cosine 1.0
    assert(got.length == n - 1, s"expected ${n - 1} hub pairs, got ${got.length}")
    assert(got.forall(r => r.getLong(0) == 0L && math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("capped plans stay free of cartesian products and BNL joins") {
    val docs = adversarialCorpus(100)
    val sigs = Dedup.minhashSignatures(
      Dedup.hashedShingleSets(docs, "text", "doc_id"))
    val pairs = Dedup.lshCandidatePairs(sigs, maxBucketSize = 8)
    pairs.collect() // AQE finalizes the plan only at runtime
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // one join, no union branch: the guard must not add a signature pass —
    // the unguarded self-join also evaluates graft_minhash twice
    assert("graft_minhash".r.findAllIn(p).length <= 2, p)
  }

  test("the audit query names the split buckets (no silent caps)") {
    val n = 100
    val docs = adversarialCorpus(n)
    val bands = Dedup.bandKeys(Dedup.minhashSignatures(
      Dedup.hashedShingleSets(docs, "text", "doc_id")), 2, 64)
    val audit = Dedup.oversizedBuckets(bands, Seq("bk"), "doc_id", 16).collect()
    // 32 bands, each with the one giant bucket of the n identical docs
    assert(audit.length == 32, s"expected 32 split buckets, got ${audit.length}")
    assert(audit.forall(r => r.getAs[Long]("bucket_size") == n.toLong &&
      r.getAs[Long]("hub_id") == 0L))
    // and nothing is reported when the cap is not hit
    assert(Dedup.oversizedBuckets(bands, Seq("bk"), "doc_id", n + 1).isEmpty)
  }
}
