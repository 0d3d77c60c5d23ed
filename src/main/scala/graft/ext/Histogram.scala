package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef.tbl

/** Fixed-grid histogram quantiles: per-group distribution summaries whose
  * state is BOUNDED and whose answers are exactly reproducible across
  * engines — the 100 TB alternative to both a full sort (exact quantiles,
  * q49's shape: one global sort per group) and order-dependent mergeable
  * sketches (t-digest/KLL, whose state depends on merge order and is
  * therefore not oracle-checkable).
  *
  * The trick making a DOUBLE column deterministic to bin: the grid scale
  * is a power of two, so `floor(value * scale)` is computed exactly —
  * multiplying a double by 2^k only shifts its exponent (no rounding),
  * and floor of an exact product is exact. Every engine with IEEE-754
  * doubles produces the identical bin id; the quantile answer (a bin's
  * lower bound, `bin / scale` — again exact) is then a pure integer
  * function of the bin counts. Accuracy is ±1/scale absolute, chosen by
  * the caller against the value domain.
  *
  * Scale shape: one shuffle keyed by (group, bin) with map-side partial
  * counts — per-partition traffic is bounded by the OCCUPIED bin count,
  * not the row count; then a per-group pass over ≤ B bins (window over
  * the bin axis) where B = domain × scale. Quantile extraction is a
  * conditional aggregate over those bins. Nothing is collected; the
  * per-group state never exceeds B counters, the property that also makes
  * the streaming twin trivial (bin-count maps merge by addition).
  */
object Histogram {

  /** Per-group exact bin counts on the power-of-two grid. */
  def gridBins(df: DataFrame, group: Column, value: Column, scale: Int): DataFrame = {
    require(scale >= 1 && (scale & (scale - 1)) == 0, "scale must be a power of two")
    df.groupBy(group.as("grp"), floor(value * scale).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group n plus lower-bound quantile values at the given percents
    * (ceil-rank convention: the q-quantile is the smallest bin whose
    * cumulative count reaches ceil(q·n/100)). */
  def gridQuantiles(df: DataFrame, group: Column, value: Column, scale: Int,
      percents: Seq[Int]): DataFrame = {
    val bins = gridBins(df, group, value, scale)
    val byBin = Window.partitionBy(col("grp")).orderBy(col("bin"))
    val whole = Window.partitionBy(col("grp"))
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(byBin))
      .withColumn("n", sum(col("cnt")).over(whole))
    val qCols = percents.map { p =>
      // target rank ceil(p*n/100) in pure integer math (ANSI-safe: n*p
      // stays far below Long.Max for any real corpus)
      (min(when(col("cum") >= expr(s"(n * $p + 99) div 100"), col("bin")))
        / lit(scale.toDouble)).as(s"p$p")
    }
    val aggs = max(col("n")).as("n") +: qCols
    cum.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
  }

  /** Kolmogorov–Smirnov drift audit on the grid: for every group, the KS
    * distance between ITS value distribution and the REST of the corpus —
    * sup over grid bins of |F_grp(b) - F_rest(b)|. The drift detector a
    * corpus pipeline runs between crawl snapshots / sources before mixing;
    * here grid-quantized (±1/scale in the value axis) which makes it
    * integer-exact: the sup is computed on |cum_g·n_rest - cum_rest·n_g|
    * (pure BIGINT cross-multiplication; safe while total rows < ~3·10^9 —
    * products stay under 2^63; `bigGrid = true` is the tested decimal(38,0)
    * switch beyond, see [[ksDriftFromBins]]), with ONE double division at
    * the end.
    *
    * The CDFs are evaluated on the union of occupied bins (a group's CDF
    * is flat where it has no mass but the rest may jump — skipping those
    * bins would under-read the sup), via a groups × occupied-bins dense
    * fill. That cross join is METADATA-sized by construction (#groups ×
    * #occupied bins, both bounded regardless of row count — the same
    * argument as [[gridBins]]' state bound), not a data cross join. */
  def ksDrift(df: DataFrame, group: Column, value: Column, scale: Int,
      bigGrid: Boolean = false): DataFrame =
    ksDriftFromBins(gridBins(df, group, value, scale), bigGrid)

  /** [[ksDrift]] on a pre-built `(grp, bin, cnt)` frame. `bigGrid = true`
    * switches the cumulative sums and cross-multiplications to
    * decimal(38,0) — the escape hatch for total rows beyond ~3·10^9,
    * where cum·n products (and even n_all itself) leave the BIGINT range.
    * Two longs' product always fits decimal(38,0) (2^126 < 10^38), so the
    * wide path is exact wherever counts are; HistogramBigGridSpec pins
    * (a) bit-agreement of both paths under the boundary and (b) the wide
    * path against BigInt brute force on counts straddling 2^63, where the
    * long path overflows (ANSI: throws). */
  def ksDriftFromBins(bins0: DataFrame, bigGrid: Boolean = false): DataFrame = {
    val bins =
      if (bigGrid) bins0.withColumn("cnt", col("cnt").cast("decimal(38,0)"))
      else bins0
    // typed zero (na.fill(Long) skips decimal columns in the wide path)
    val zero = lit(0L).cast(if (bigGrid) "decimal(38,0)" else "long")
    val dense = bins.select(col("grp")).distinct()
      .crossJoin(bins.select(col("bin")).distinct())
      .join(bins, Seq("grp", "bin"), "left_outer")
      .withColumn("cnt", coalesce(col("cnt"), zero))
    val byBin = Window.partitionBy(col("grp")).orderBy(col("bin"))
    val cum = dense
      .withColumn("cum", sum(col("cnt")).over(byBin))
      .withColumn("gcum", sum(col("cum")).over(Window.partitionBy(col("bin"))))
      .withColumn("n_g", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
      .withColumn("n_all", sum(col("cnt")).over(Window.partitionBy()))
    cum
      .withColumn("scaled", abs(
        col("cum") * (col("n_all") - col("n_g")) -
          (col("gcum") - col("cum")) * col("n_g")))
      .groupBy(col("grp"))
      .agg(max(col("n_g")).as("n"), max(col("n_all")).as("n_total"),
        max(col("scaled")).as("ks_scaled"))
      .select(col("grp"), col("n"), col("ks_scaled"),
        // single-group input: n_rest = 0 makes the divisor 0 — emit null
        // rather than NaN/Infinity (the weeklyKsDrift guard, kept row-stable)
        when(col("n_total") > col("n"),
          col("ks_scaled").cast("double") /
            (col("n") * (col("n_total") - col("n")))).as("ks"))
  }

  /** WEEK-OVER-WEEK drift: for every (group, week), the grid-KS distance
    * of this week's value distribution vs the SAME group's previous week —
    * the temporal twin of [[ksDrift]] and the monitor a production
    * pipeline actually alerts on (yesterday's crawl vs today's). Weeks are
    * integer nano-epochs div 7 days (no calendar/timezone surface). Each
    * (group, week) comparison runs on the union of the two weeks' occupied
    * bins (same dense-fill argument as [[ksDrift]]); all arithmetic
    * integer until the final division. Weeks with no previous-week data
    * are omitted (nothing to compare). `bigGrid` widens counts to
    * decimal(38,0), same contract as [[ksDriftFromBins]]. */
  def weeklyKsDrift(df: DataFrame, group: Column, value: Column,
      tsNanosCol: String, scale: Int, bigGrid: Boolean = false): DataFrame = {
    require(scale >= 1 && (scale & (scale - 1)) == 0, "scale must be a power of two")
    val weekNs = 7L * 24 * 3600 * 1000000000L
    // integer div (Column./ is DOUBLE division and ts nanos exceed 2^53)
    val b = df
      .groupBy(group.as("grp"), expr(s"$tsNanosCol div ${weekNs}L").as("wk"),
        floor(value * scale).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cnt",
        if (bigGrid) col("cnt").cast("decimal(38,0)") else col("cnt"))
    val zero = lit(0L).cast(if (bigGrid) "decimal(38,0)" else "long")
    // bins relevant to the (wk-1 -> wk) comparison: this week's plus the
    // previous week's (shifted forward)
    val keys = b.select(col("grp"), col("wk"), col("bin"))
      .unionByName(b.select(col("grp"), (col("wk") + 1).as("wk"), col("bin")))
      .distinct()
    val cur = b.select(col("grp"), col("wk"), col("bin"), col("cnt").as("c_cur"))
    val prev = b.select(col("grp"), (col("wk") + 1).as("wk"), col("bin"),
      col("cnt").as("c_prev"))
    val dense = keys
      .join(cur, Seq("grp", "wk", "bin"), "left_outer")
      .join(prev, Seq("grp", "wk", "bin"), "left_outer")
      .withColumn("c_cur", coalesce(col("c_cur"), zero))
      .withColumn("c_prev", coalesce(col("c_prev"), zero))
    val byBin = Window.partitionBy(col("grp"), col("wk")).orderBy(col("bin"))
    val whole = Window.partitionBy(col("grp"), col("wk"))
    dense
      .withColumn("cum_cur", sum(col("c_cur")).over(byBin))
      .withColumn("cum_prev", sum(col("c_prev")).over(byBin))
      .withColumn("n_cur", sum(col("c_cur")).over(whole))
      .withColumn("n_prev", sum(col("c_prev")).over(whole))
      .where(col("n_cur") > 0 && col("n_prev") > 0)
      .withColumn("scaled",
        abs(col("cum_cur") * col("n_prev") - col("cum_prev") * col("n_cur")))
      .groupBy(col("grp"), col("wk"))
      .agg(max(col("n_cur")).as("n_cur"), max(col("n_prev")).as("n_prev"),
        max(col("scaled")).as("ks_scaled"))
      .select(col("grp"), col("wk"), col("n_cur"), col("n_prev"), col("ks_scaled"),
        (col("ks_scaled").cast("double") / (col("n_cur") * col("n_prev"))).as("ks"))
  }

  val queries: Seq[QueryDef] = Seq(
    // Per-event-type value quantiles on the 1/16 grid. The oracle rebuilds
    // the identical bins (floor(value*16) is exact in IEEE-754) and the
    // identical ceil-rank picks — approximate-in-value yet bit-exact
    // across engines.
    QueryDef(
      "q103_grid_quantiles",
      (s, dir) => Histogram.gridQuantiles(
          tbl(s, dir, "events"), col("event_type"), col("value"), 16,
          Seq(50, 90, 99))
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH b AS (
             |  SELECT event_type, CAST(floor(value * 16) AS BIGINT) AS bin,
             |    COUNT(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |c AS (
             |  SELECT event_type, bin, cnt,
             |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             |    SUM(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM b)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             |  MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bin END) / 16.0 AS p50,
             |  MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bin END) / 16.0 AS p90,
             |  MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bin END) / 16.0 AS p99
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // Distribution drift per event type: grid-KS distance of each type's
    // value distribution vs the rest of the corpus. Integer cross-
    // multiplication up to the single final division — bit-exact across
    // engines despite being a "statistical" measure.
    QueryDef(
      "q110_ks_drift",
      (s, dir) => Histogram.ksDrift(
          tbl(s, dir, "events"), col("event_type"), col("value"), 16)
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH b AS (
             |  SELECT event_type AS grp, CAST(floor(value * 16) AS BIGINT) AS bin,
             |    COUNT(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |dense AS (
             |  SELECT g.grp, a.bin, COALESCE(b.cnt, 0) AS cnt
             |  FROM (SELECT DISTINCT grp FROM b) g
             |  CROSS JOIN (SELECT DISTINCT bin FROM b) a
             |  LEFT JOIN b ON b.grp = g.grp AND b.bin = a.bin),
             |c AS (
             |  SELECT grp, bin, cnt,
             |    SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
             |    SUM(cnt) OVER (PARTITION BY grp) AS n_g,
             |    SUM(cnt) OVER () AS n_all
             |  FROM dense),
             |c2 AS (SELECT *, SUM(cum) OVER (PARTITION BY bin) AS gcum FROM c)
             |SELECT grp AS event_type, CAST(MAX(n_g) AS BIGINT) AS n,
             |  CAST(MAX(abs(cum*(n_all-n_g) - (gcum-cum)*n_g)) AS BIGINT) AS ks_scaled,
             |  CAST(MAX(abs(cum*(n_all-n_g) - (gcum-cum)*n_g)) AS DOUBLE)
             |    / (MAX(n_g) * (MAX(n_all) - MAX(n_g))) AS ks
             |FROM c2 GROUP BY grp ORDER BY event_type""".stripMargin),
    ),

    // Week-over-week drift per event type: grid-KS of each week's value
    // distribution vs the same type's previous week — the temporal
    // monitoring twin of q110, integer-exact the same way. DuckDB sees
    // the ns parquet as TIMESTAMP_NS; epoch_ns(ts) == the long Spark
    // reads under nanosAsLong.
    QueryDef(
      "q111_weekly_drift",
      (s, dir) => Histogram.weeklyKsDrift(
          tbl(s, dir, "events"), col("event_type"), col("value"), "ts", 16)
        .withColumnRenamed("grp", "event_type")
        .orderBy(col("event_type"), col("wk")),
      Some("""WITH b AS (
             |  SELECT event_type AS grp, epoch_ns(ts) // 604800000000000 AS wk,
             |    CAST(floor(value * 16) AS BIGINT) AS bin, COUNT(*) AS cnt
             |  FROM events GROUP BY 1, 2, 3),
             |keys AS (
             |  SELECT grp, wk, bin FROM b
             |  UNION
             |  SELECT grp, wk + 1 AS wk, bin FROM b),
             |dense AS (
             |  SELECT k.grp, k.wk, k.bin,
             |    COALESCE(c.cnt, 0) AS c_cur, COALESCE(p.cnt, 0) AS c_prev
             |  FROM keys k
             |  LEFT JOIN b c ON c.grp = k.grp AND c.wk = k.wk AND c.bin = k.bin
             |  LEFT JOIN b p ON p.grp = k.grp AND p.wk + 1 = k.wk AND p.bin = k.bin),
             |c AS (
             |  SELECT grp, wk, bin,
             |    SUM(c_cur) OVER (PARTITION BY grp, wk ORDER BY bin) AS cum_cur,
             |    SUM(c_prev) OVER (PARTITION BY grp, wk ORDER BY bin) AS cum_prev,
             |    SUM(c_cur) OVER (PARTITION BY grp, wk) AS n_cur,
             |    SUM(c_prev) OVER (PARTITION BY grp, wk) AS n_prev
             |  FROM dense)
             |SELECT grp AS event_type, wk,
             |  CAST(MAX(n_cur) AS BIGINT) AS n_cur,
             |  CAST(MAX(n_prev) AS BIGINT) AS n_prev,
             |  CAST(MAX(abs(cum_cur*n_prev - cum_prev*n_cur)) AS BIGINT) AS ks_scaled,
             |  CAST(MAX(abs(cum_cur*n_prev - cum_prev*n_cur)) AS DOUBLE)
             |    / (MAX(n_cur) * MAX(n_prev)) AS ks
             |FROM c WHERE n_cur > 0 AND n_prev > 0
             |GROUP BY grp, wk ORDER BY event_type, wk""".stripMargin),
    ),
  )
}
