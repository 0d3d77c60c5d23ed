package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count sketching for training-data pipelines (SURVEY.md §2.4
  * extension set): KMV (k-minimum-values) cardinality estimation.
  *
  * Why KMV and not HyperLogLog here: KMV over the portable md5-derived
  * 60-bit hash ([[Sampling.portableHash]]) is fully DETERMINISTIC — the
  * sketch state (the k smallest distinct hash values) and the estimate are
  * pure functions of the input SET, independent of partitioning, merge
  * order, and engine. That makes the estimator itself oracle-checkable
  * bit-for-bit in DuckDB, where approx_count_distinct implementations
  * differ by engine and are untestable against each other.
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"): with U = 2^60 the hash space and h_(k) the k-th smallest
  * distinct hash, D ≈ (k-1) * U / h_(k); when fewer than k distinct
  * values exist the sketch IS the exact distinct set.
  *
  * Scale shape: ONE shuffle keyed by group. The aggregation buffer is a
  * bounded sorted list of ≤ k longs with in-buffer dedup, so map-side
  * partial aggregation reduces every partition to at most k values per
  * group before the exchange — per-group traffic is O(k), not O(rows) and
  * not O(distinct). At 100 TB this is the difference between shuffling
  * the vocabulary and shuffling 4 KiB per group. (The exact
  * `countDistinct` companion column in [[kmvDistinct]] is the accuracy
  * audit, costing a distinct expand — drop it in production use.)
  */
object Sketches {

  /** Hash-space size for [[Sampling.portableHash]]: 15 hex digits = 2^60. */
  val HashSpace: Double = 1.152921504606846976e18

  /** Bounded k-minimum-DISTINCT-values buffer: ascending sorted list,
    * duplicates dropped, capped at k. Commutative + associative merge, so
    * Spark may combine partials in any order with identical results. */
  final class MinK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[Long], x: Long): List[Long] = {
      if (buf.sizeIs >= k && buf.last < x) buf
      else {
        val (front, back) = buf.span(_ < x)
        if (back.headOption.contains(x)) buf // already present: keep distinct
        else (front ::: x :: back).take(k)
      }
    }

    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `kMinValues(k)(hashCol)` in `groupBy.agg` — returns the
    * ascending array of the group's ≤ k smallest distinct hash values. */
  def kMinValues(k: Int): Column => Column = {
    val agg = udaf(new MinK(k), Encoders.scalaLong)
    (h: Column) => agg(h)
  }

  /** Per-group distinct-count estimate from a KMV sketch over
    * `itemCol`'s portable hash, with the exact count alongside as the
    * accuracy audit.
    *
    * Output: group | n_exact | n_sketch | kth_hash | est_distinct.
    * `kth_hash` is NULL (and the estimate exact) when the group has fewer
    * than k distinct items. */
  def kmvDistinct(items: DataFrame, groupCol: String, itemCol: Column,
      k: Int): DataFrame = {
    val numer = (k - 1).toDouble * HashSpace // small-int × 2^60: exact double
    items
      .groupBy(col(groupCol))
      .agg(
        kMinValues(k)(Sampling.portableHash(itemCol)).as("hs"),
        countDistinct(itemCol).as("n_exact"))
      .select(
        col(groupCol),
        col("n_exact"),
        size(col("hs")).cast("long").as("n_sketch"),
        when(size(col("hs")) === k, element_at(col("hs"), k)).as("kth_hash"),
        when(size(col("hs")) === k, lit(numer) / element_at(col("hs"), k))
          .otherwise(size(col("hs")).cast("double")).as("est_distinct"))
  }
}
