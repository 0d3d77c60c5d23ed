package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multi-probe LSH invariants. nprobe=1 must coincide with the all-codegen
  * [[Similarity.annTopK]] at the same (tables, bits) — which proves the
  * query-side margin-reconstructed signatures equal the codegen
  * signatures bit-for-bit. Extra probes only ADD candidate buckets, so
  * per-query top-k quality is monotone in nprobe. */
class MultiProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = graft.queries.QueryDef.tbl(spark, "/root/testdata/sf0.001", "embeddings")

  test("nprobe=1 equals annTopK at the same table/bit config (sig bit-consistency)") {
    val q = emb.where(col("vec_id") < 10)
    val single = Similarity.multiProbeTopK(emb, q, "embedding", "vec_id",
        k = 3, tables = 4, bits = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ann = Similarity.annTopK(emb, q, "embedding", "vec_id",
        k = 3, tables = 4, bitsPerTable = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(single == ann)
  }

  test("top-k quality is monotone in nprobe and reaches brute-force on this corpus") {
    val q = emb.where(col("vec_id") < 10)
    def minSimPerQ(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("qid")).agg(min(col("sim")).as("ms"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val p1 = minSimPerQ(Similarity.multiProbeTopK(emb, q, "embedding", "vec_id",
      k = 3, tables = 4, bits = 4, nprobe = 1))
    val p4 = minSimPerQ(Similarity.multiProbeTopK(emb, q, "embedding", "vec_id",
      k = 3, tables = 4, bits = 4, nprobe = 4))
    assert(p4.keySet == (0L until 10L).toSet)
    p4.foreach { case (qid, (ms4, n4)) =>
      assert(n4 == 3L, s"q$qid full k")
      p1.get(qid).foreach { case (ms1, _) =>
        assert(ms4 >= ms1, s"q$qid: extra probes can only improve the top-k floor")
      }
    }
    // recall vs exact top-3: multi-probe at 4x4 should recover most of it
    val brute = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = Similarity.multiProbeTopK(emb, q, "embedding", "vec_id",
        k = 3, tables = 4, bits = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & mp).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall below the multi-probe design point")
  }
}
