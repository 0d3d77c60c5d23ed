package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Multi-dimensional data layout: Morton (z-order) interleaving for
  * co-clustering two scan dimensions in one physical sort order.
  *
  * Why this is an engine feature and not an application detail: at 100 TB
  * a table is pruned through per-file (or per-row-group) min/max
  * statistics, and a single-column sort gives tight stats on ONE column
  * only — a `user_id` equality predicate over a ts-sorted events table
  * still touches EVERY file. Writing the table ordered by the interleaved
  * z-value bounds every file to a small rectangle in (x, y) space, so
  * min/max pruning works on EITHER dimension (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER`; the V2 replay connector's row-group
  * pruning composes with it directly, and `LayoutSpec` measures the
  * per-partition span shrinkage).
  *
  * Everything here is pure integer bit arithmetic — map-only, ANSI-safe
  * (values are masked below 2^bits before shifting, interleaved width
  * 2·bits ≤ 62 never overflows a long), codegen-friendly (shift/and/or
  * only), and replicated token-for-token in the DuckDB oracle via
  * [[zValueSql]].
  */
object Layout {

  /** Morton z-value of two dimensions, `bits` bits each: bit i of `x`
    * lands at z-bit 2i+1, bit i of `y` at z-bit 2i. Inputs are masked to
    * their low `bits` bits first, so any non-negative long is safe (the
    * caller picks `bits` to cover the real domain — wrapped values fold
    * distant points together, costing locality, never correctness). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical expression as DuckDB SQL text (interpolated into
    * oracles, the RHP-plane-literal pattern): `x`/`y` are SQL
    * sub-expressions producing BIGINT. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i + 1}) | (((($y) >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")

  /** Physically lay `df` out in z-order: range-partition by the z-value
    * (range, not hash — neighbouring z-cells land in the same partition,
    * which is what gives each output file a tight rectangle) and sort
    * within partitions so row-group stats inside each file are tight too.
    * Writers then emit one file set whose min/max stats prune on both
    * dimensions. */
  def zOrderLayout(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))

  /** Exact equi-depth range bounds: split a (pre-quantized, integer)
    * value column into `buckets` contiguous ranges of near-equal row
    * count — the range-partitioner / sorted-writer planning primitive
    * (`repartitionByRange` SAMPLES its bounds; a deterministic layout
    * contract, e.g. a bucketed table spec or a cross-run-stable file
    * split, needs exact ones). Each distinct value v lands in bucket
    * `(rows_below_v · buckets) div n + 1`, so ties never straddle a
    * boundary; returns (bucket, lo, hi, n_rows).
    *
    * Scale shape: one map-side-combinable count per DISTINCT value, then
    * a running sum over the distinct-value table — vocabulary-sized, NOT
    * row-sized (prices in cents, grid-quantized doubles: ~10^5-10^7
    * distinct; the single-partition window is the q110 metadata-frame
    * argument and holds only (value, count) pairs). For genuinely
    * unbounded domains, grid-quantize first ([[Histogram]]'s binning) —
    * same invariant the KS operators rely on. */
  def equiDepthBounds(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(value.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    val cum = counts.crossJoin(broadcast(total))
      .withColumn("cb", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum
      .withColumn("bucket", expr(s"(cb * $buckets) div n + 1"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("cnt")).as("n_rows"))
  }

  val queries: Seq[QueryDef] = Seq(
    // Z-order locality audit over events on (user_id, hour-of-corpus):
    // bucket = the top 6 z-bits = a cell of the space-filling curve; the
    // per-bucket min/max of BOTH dimensions are the file-level stats a
    // z-ordered writer would produce — the oracle checks the interleave
    // bit-for-bit via the generated integer expression. Map-only scan +
    // one map-side-combinable aggregate; nothing wide, nothing collected.
    QueryDef(
      "q100_zorder_stats",
      (s, dir) => {
        val bits = 10
        val ev = tbl(s, dir, "events")
        val hx = expr("(ts - 1704067200000000000L) div 3600000000000L") // long div: ns -> hour idx
        ev.select(col("user_id"), hx.as("hr"))
          .select(col("user_id"), col("hr"),
            Layout.zValue(col("user_id") % 1024L, col("hr"), bits).as("z"))
          .groupBy(shiftright(col("z"), 2 * bits - 6).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
            min(col("hr")).as("min_hr"), max(col("hr")).as("max_hr"))
          .orderBy(col("bucket"))
      },
      Some {
        val z = zValueSql("user_id % 1024", "hr", 10)
        s"""WITH e AS (SELECT user_id,
           |    (epoch_ns(ts) - 1704067200000000000) // 3600000000000 AS hr
           |  FROM events),
           |z AS (SELECT user_id, hr, ($z) AS z FROM e)
           |SELECT z >> 14 AS bucket, COUNT(*) AS n,
           |  MIN(user_id) AS min_user, MAX(user_id) AS max_user,
           |  MIN(hr) AS min_hr, MAX(hr) AS max_hr
           |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
      },
    ),

    // Exact equi-depth range bounds over lineitem price cents (8 buckets):
    // the deterministic range-partitioner plan. floor(price*100) is the
    // cross-engine double quantization (identical IEEE ops); all bucket
    // math is integer on the distinct-value table.
    QueryDef(
      "q147_range_bounds",
      (s, dir) => Layout.equiDepthBounds(tbl(s, dir, "lineitem"),
          floor(col("l_extendedprice") * 100), buckets = 8)
        .orderBy(col("bucket")),
      Some("""WITH c AS (
             |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
             |b AS (
             |  SELECT v, cnt, COALESCE(SUM(cnt) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
             |  FROM c)
             |SELECT CAST((cb * 8) // t.n + 1 AS BIGINT) AS bucket,
             |  MIN(v) AS lo, MAX(v) AS hi, CAST(SUM(cnt) AS BIGINT) AS n_rows
             |FROM b, t GROUP BY 1 ORDER BY bucket""".stripMargin),
    ),
  )
}
