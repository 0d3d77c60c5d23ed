package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Units for the round-3 retrieval/ingest operators: matryoshka-truncated
  * top-k (q68) and incremental cross-corpus near-dup (q70). */
class IncrementalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("truncatedTopK: full-width truncation is exactly full retrieval; recall grows with dims") {
    val queries = emb.where(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 5))
    // full dims through the truncated path is exactly the full retrieval
    assert(pairs(Similarity.truncatedTopK(emb, queries, "embedding", "vec_id", 64, 5)) == full)
    // absolute prefix recall depends on MRL TRAINING, which these synthetic
    // (unstructured) embeddings don't have — the mechanical contract is
    // that recall improves as the prefix widens toward the full vector
    def recallAt(d: Int) = {
      val t = pairs(Similarity.truncatedTopK(emb, queries, "embedding", "vec_id", d, 5))
      (full & t).size.toDouble / full.size
    }
    val r16 = recallAt(16); val r48 = recallAt(48)
    info(f"prefix recall@5: dims=16 -> $r16%.3f, dims=48 -> $r48%.3f (synthetic, non-MRL)")
    assert(r48 > r16, s"recall must grow with prefix width: r16=$r16 r48=$r48")
    assert(r16 > 0.0)
  }

  test("incrementalNearDups finds cross-corpus duplicates only, never corpus-internal pairs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // corpus-internal dup of 1
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1 and 2
      (11L, "nine ten eleven twelve thirteen fourteen")).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(fresh, corpus, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L)))
  }

  test("clusterSurvivors: preference picks the survivor without changing the clustering") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 30L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", 50L), // longest in cluster
      (3L, "alpha beta gamma delta epsilon zeta", 30L),
      (4L, "one two three four five six", 25L)) // singleton, no edges -> absent
      .toDF("doc_id", "text", "n_chars")
    val longest = Dedup.clusterSurvivors(docs, "text", "doc_id",
        struct(col("n_chars"), (-col("doc_id")).as("nid")), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(longest.toSeq == Seq((1L, 2L, 3L))) // root=min id, survivor=longest
    // min-id preference reproduces the classic keep-oldest survivor
    val oldest = Dedup.clusterSurvivors(docs, "text", "doc_id",
        (-col("doc_id")).as("p"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(oldest.toSeq == Seq((1L, 1L, 3L)))
  }

  test("incrementalNearDups agrees with the brute-force cross scan on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fresh = docs.where(col("source") =!= "src0")
    val corpus = docs.where(col("source") === "src0")
    val fast = Dedup.incrementalNearDups(fresh, corpus, "text", "doc_id", 0.5)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.hashedShingleSets(fresh, "text", "doc_id").select(col("doc_id").as("new_id"), col("s").as("sa"))
      .crossJoin(Dedup.hashedShingleSets(corpus, "text", "doc_id")
        .select(col("doc_id").as("corpus_id"), col("s").as("sb")))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter").cast("double")
        / (size(col("sa")) + size(col("sb")) - col("inter")))
      .where(col("j") >= 0.5)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute)
  }
}
