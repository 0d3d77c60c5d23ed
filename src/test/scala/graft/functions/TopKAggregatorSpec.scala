package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ext.Similarity

/** The partial-agg top-k must agree with the window row_number formulation. */
class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topK aggregator equals orderBy+limit ground truth") {
    val df = Seq(
      (1L, 0.9), (2L, 0.5), (3L, 0.95), (4L, 0.95), (5L, 0.1), (6L, 0.7))
      .toDF("id", "score").repartition(4) // force partial buffers to merge
    val got = df.agg(TopKAggregator.topK(3)(col("score"), col("id")).as("top"))
      .selectExpr("inline(top)")
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((0.95, 3L), (0.95, 4L), (0.9, 1L)))
  }

  test("grouped topK matches the window-based bruteForceTopK") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    // window-based reference
    val viaWindow = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // aggregator-based: same sims, top-k via partial aggregation
    val c = Similarity.withNorm(emb, "embedding")
      .select(col("vec_id").as("nid"), col("embedding").as("v_c"), col("nrm").as("nrm_c"))
    val q = Similarity.withNorm(queries, "embedding")
      .select(col("vec_id").as("qid"), col("embedding").as("v_q"), col("nrm").as("nrm_q"))
    val sims = c.crossJoin(broadcast(q)).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (Similarity.dot(col("v_q"), col("v_c")) / (col("nrm_q") * col("nrm_c"))).as("sim"))
    val viaAgg = sims.groupBy("qid")
      .agg(TopKAggregator.topK(4)(col("sim"), col("nid")).as("top"))
      .selectExpr("qid", "inline(top)")
      .select(col("qid"), col("id").as("nid"))
      .as[(Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
