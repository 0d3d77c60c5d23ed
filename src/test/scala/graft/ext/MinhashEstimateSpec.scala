package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The sketch-only Jaccard estimator: measured quality vs the exact
  * pipeline on the real corpus. */
class MinhashEstimateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("estimate tracks exact Jaccard on LSH candidates (MAE < 0.08)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // threshold 0 on the estimator side: score ALL candidates, then compare
    val est = Dedup.estimatedJaccardPairs(docs, "text", "doc_id", threshold = 0.0)
    val exact = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.0)
      .withColumnRenamed("jaccard", "exact_j")
    val joined = est.join(exact, Seq("a_id", "b_id")).collect()
    assert(joined.length > 20, "need a meaningful candidate sample")
    val errs = joined.map(r => math.abs(r.getDouble(2) - r.getDouble(3)))
    val mae = errs.sum / errs.length
    info(f"candidates=${joined.length} MAE=$mae%.4f max=${errs.max}%.4f")
    assert(mae < 0.08, f"mean abs error $mae%.4f")
  }

  test("estimator at threshold 0.5 finds the same pairs as exact verification") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val est = pairSet(Dedup.estimatedJaccardPairs(docs, "text", "doc_id", 0.5))
    val exact = pairSet(Dedup.jaccardPairs(docs, "text", "doc_id", 0.5))
    // near-dup corpus pairs sit far above 0.5, so estimator noise (±0.06)
    // should not flip any of them
    assert(est == exact,
      s"estimator flipped pairs: only-est=${est -- exact}, only-exact=${exact -- est}")
  }
}
