package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline the
  * engine exists for at 100 TB: language filter -> quality filter -> exact
  * dedup -> near-dup removal -> per-source stats. Every stage is one of the
  * §2.4 operators; stages stay declarative so Catalyst fuses the filters
  * into the scan and the only shuffles are the dedup keys, the LSH bucket
  * join and the final rollup.
  */
object Curation {

  /** Deterministic near-dup survivor rule: a doc is dropped iff it is the
    * higher id of SOME qualifying pair (keep-the-oldest policy). */
  def removeNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", threshold)
    docs.join(pairs.select(col("b_id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Curate: keep docs that look English, clear the quality bar, survive
    * exact dedup (min doc_id per text) and near-dup removal; report
    * per-source corpus stats. */
  def curate(docs: DataFrame, minQuality: Double, nearDupThreshold: Double): DataFrame = {
    val scored = docs
      .withColumn("lang_pred",
        TextAnalysis.langPred(TextAnalysis.stopwordRatio(col("text"))))
      .withColumn("quality",
        TextAnalysis.qualityScore(col("text"), TextAnalysis.tokenCount(col("text"))))
    val filtered = scored
      .where(col("lang_pred") === "en" && col("quality") >= minQuality)
    // exact dedup: survivor = min doc_id per identical text
    val exactKept = filtered.join(
      filtered.groupBy(col("text").as("t_key")).agg(min(col("doc_id")).as("doc_id")),
      Seq("doc_id"), "left_semi")
    val kept = removeNearDups(exactKept, nearDupThreshold)
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("kept_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("kept_tokens"),
        min(col("doc_id")).as("first_doc"))
  }
}
