package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** MMR diversified retrieval + skew audit: the defining behaviors.
  * MMR's whole point: pure top-k returns both copies of a duplicated
  * result; MMR keeps one and swaps genuinely different material in. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mmrTopK skips the duplicate that plain top-k keeps") {
    // qid 0 is the query; 10/11 are identical near-perfect matches;
    // 12 is a distinct direction, still relevant; 13 is anti-aligned noise
    // 10/11 identical; 12 equally relevant to q but orthogonal to 10/11
    // (rel ties at step 1 break on id). MMR step 2: score(11) =
    // 0.7·0.707 − 0.3·1.0 ≈ 0.195 < score(12) = 0.7·0.707 − 0.3·0 ≈ 0.495.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(0.7f, 0.7f, 0.0f)),
      (11L, Seq(0.7f, 0.7f, 0.0f)),
      (12L, Seq(0.7f, -0.7f, 0.0f)),
      (13L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = rows.where(col("vec_id") === 0L)
    val mmr = Similarity.mmrTopK(rows, q, "embedding", "vec_id", m = 4, k = 2)
      .orderBy(col("step")).collect()
    assert(mmr.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(mmr(0).getLong(1) == 10L, "step 1 = most relevant (lowest id on tie)")
    assert(mmr(1).getLong(1) == 12L,
      "step 2 must skip the duplicate (11) for the diverse result (12)")
    // plain top-2 would have returned exactly the duplicate pair
    val brute = Similarity.bruteForceTopK(rows, q, "embedding", "vec_id", 2)
      .collect().map(_.getAs[Long]("nid")).toSet
    assert(brute == Set(10L, 11L))
  }

  test("mmrTopK: k distinct selections per query, step 1 maximizes rel") {
    val emb = graft.queries.QueryDef.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.mmrTopK(emb, emb.where(col("vec_id") < 5),
      "embedding", "vec_id", m = 8, k = 4).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length == 4, s"q$qid distinct picks")
      assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"q$qid steps")
      val rels = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(rels.head == rels.max, s"q$qid step-1 relevance")
    }
  }

  test("mmrTopK k=20: constant-depth plans keep deep selection tractable") {
    // The r8 verdict flagged the old chained-plan greedy loop: plan size
    // ~doubled per step, so the ANALYZER (driver CPU, not the cluster) was
    // the k >= 15 bottleneck. The collected-selection form must run a
    // k = 20 selection comfortably, and greedy selection is PREFIX-STABLE:
    // the first 4 steps of the k = 20 run must equal the k = 4 run
    // bit-for-bit (same pool, same pairwise sims, same tie rule) — which
    // also pins the refactor bit-identical on q145's k = 4 configuration.
    val emb = graft.queries.QueryDef.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where(col("vec_id") < 3)
    val t0 = System.nanoTime()
    val deep = Similarity.mmrTopK(emb, q, "embedding", "vec_id", m = 24, k = 20)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 90.0, s"k=20 MMR took $secs s — analyzer blow-up is back")
    val byQ = deep.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 3L).toSet)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length == 20, s"q$qid distinct picks")
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to 20L), s"q$qid steps")
    }
    val shallow = Similarity.mmrTopK(emb, q, "embedding", "vec_id", m = 24, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val deepPrefix = deep.filter(_.getLong(2) <= 4L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(deepPrefix == shallow, "greedy prefix-stability (bit-exact rel)")
  }

  test("skewAudit: exact shares, ceil salts, threshold filter") {
    val df = (Seq.fill(700)("hot") ++ Seq.fill(295)("warm") ++ Seq.fill(5)("cold"))
      .toDF("k")
    val got = Skew.skewAudit(df, "k", targetPerTask = 100L, thresholdPpm = 10000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("hot", "warm"), "cold (0.5%) is below the 1% threshold")
    assert(got("hot") == (700L, 700000L, 7L))
    assert(got("warm") == (295L, 295000L, 3L), "ceil(295/100) = 3")
  }
}
