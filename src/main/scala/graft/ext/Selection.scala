package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy set-cover corpus selection: pick documents one at a time, each
  * round taking the document covering the most not-yet-covered elements
  * (ties to the smallest doc_id — a total order, so the whole run is
  * deterministic and oracle-replayable). The classic ln(n)-approximation
  * to minimum cover, used as a coverage-driven data-selection pass:
  * "which k documents together span the most vocabulary/bigram/feature
  * space" — the complement of dedup (maximize diversity instead of
  * removing redundancy).
  *
  * Greedy is INHERENTLY sequential (each pick changes every later gain),
  * so the loop is driver-side over k rounds — but per round the cluster
  * does all the work: one (doc)-keyed count + a broadcast anti-join
  * removing the winner's elements; the driver collects exactly ONE row
  * (the argmax), k-bounded like the centroid collects in
  * [[Similarity]]. Lineage is flattened per round. At 100 TB the same
  * shape holds (rounds are k, each a scan of the shrinking remaining
  * set); for large k swap in the one-pass streaming-greedy approximation
  * and keep this as the reference semantics. */
object Selection {

  /** (doc_id, w) pairs — per-doc DISTINCT bigrams of the whitespace
    * tokenization (the cover universe; bigrams give a usefully larger
    * element space than the raw vocabulary). Docs with fewer than two
    * tokens contribute nothing. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t"))
      .select(col("doc_id"), explode(array_distinct(
        // guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not
        // the empty list DuckDB's generate_series gives — branch around it
        when(size(col("t")) >= 2, expr(
          "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .otherwise(array().cast("array<string>")))).as("w"))

  /** Run `maxRounds` greedy picks over element pairs `(doc_id, w)`;
    * stops early when everything is covered. Returns one row per pick:
    * (round, doc_id, gain). */
  def greedyCover(spark: SparkSession, docElems: DataFrame,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 64, "maxRounds in [1,64]")
    var remaining = docElems.localCheckpoint(true)
    val picks = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= maxRounds && !exhausted) {
      val best = remaining
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val docId = best(0).getLong(0)
        val gain = best(0).getLong(1)
        picks += ((r.toLong, docId, gain))
        val won = remaining.where(col("doc_id") === docId).select(col("w"))
        remaining = remaining.join(won, Seq("w"), "left_anti")
          .localCheckpoint(true)
      }
      r += 1
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "doc_id", "gain")
  }
}
