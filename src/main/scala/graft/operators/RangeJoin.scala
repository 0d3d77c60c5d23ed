package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable range (interval) join — "each left point row joins every right
  * interval containing it, per key" — the other time-series join Spark has
  * no native operator for (the naive `ON l.ts BETWEEN r.lo AND r.hi` plans
  * a nested-loop join).
  *
  * Formulation: pick a bucket width ~ the typical interval length. Each
  * right interval explodes into the time buckets it covers (≤
  * len/width + 1 rows); each left point lives in exactly one bucket. An
  * EQUI-join on (key, bucket) then a residual `BETWEEN` filter gives the
  * exact result — each (point, interval) pair meets in exactly one bucket
  * (the point's), so no dedup is needed.
  *
  * Scale: one shuffle of each side keyed by (key, bucket); right-side
  * amplification is bounded by interval/width + 1 (pick width accordingly);
  * skew falls back to AQE. Replaces an O(L×R) nested loop with a hash
  * join. */
object RangeJoin {

  /** @param points     left side: rows with a point column `tsCol`
    * @param intervals  right side: rows with `[loCol, hiCol]` (inclusive)
    * @param keyCol     equi key present on both sides
    * @param bucketWidth bucket size in `tsCol` units
    * @return every (point row ++ interval row) pair with lo <= ts <= hi */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    val p = points.withColumn("bucket", expr(s"$tsCol div $bucketWidth"))
    val i = intervals
      .withColumn("bucket",
        explode(sequence(expr(s"$loCol div $bucketWidth"), expr(s"$hiCol div $bucketWidth"))))
    p.join(i, Seq(keyCol, "bucket"))
      .where(col(tsCol).between(col(loCol), col(hiCol)))
      .drop("bucket")
  }
}
