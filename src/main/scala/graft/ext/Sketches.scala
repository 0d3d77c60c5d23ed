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
/** Bounded Misra-Gries buffer: total row count + at most k item counters.
  * Top-level so Spark's `ExpressionEncoder` accepts it (DEVNOTES rule 8). */
final case class FreqBuf(n: Long, counts: Map[String, Long])

object Sketches {

  /** Hash-space size for [[Sampling.portableHash]]: 15 hex digits = 2^60. */
  val HashSpace: Double = 1.152921504606846976e18

  /** Bounded k-minimum-DISTINCT-values buffer: a fixed-capacity sorted
    * array (slot 0 = fill count, values ascending in 1..count), duplicates
    * dropped, capped at k. Commutative + associative merge, so Spark may
    * combine partials in any order with identical results.
    *
    * Per-row cost: one binary search; once the buffer is full the common
    * path (x >= current max) rejects in O(1) — the difference between
    * O(rows × k) list traversals and O(rows × log k) on a 100 TB token
    * stream. In-place mutation is safe: Aggregator buffers are owned by
    * the aggregation operator between serializations. */
  final class MinK(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = newBuffer(k)

    override def reduce(buf: Array[Long], x: Long): Array[Long] = insertMinK(buf, x, k)

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 1
      val n = b(0).toInt
      var acc = a
      while (i <= n) { acc = insertMinK(acc, b(i), k); i += 1 }
      acc
    }

    override def finish(r: Array[Long]): Seq[Long] =
      r.slice(1, r(0).toInt + 1).toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Fresh KMV buffer: slot 0 = fill count, capacity k values. */
  def newBuffer(k: Int): Array[Long] = new Array[Long](k + 1)

  /** In-place KMV insert — shared by the batch aggregator and the
    * streaming sketch state. Returns the (mutated) buffer. */
  def insertMinK(buf: Array[Long], x: Long, k: Int): Array[Long] = {
    val n = buf(0).toInt
    if (n >= k && buf(n) < x) return buf // common fast path: not a min
    // binary search over buf(1..n)
    var lo = 1; var hi = n + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo <= n && buf(lo) == x) return buf // distinct: drop duplicate
    val keep = math.min(n + 1, k)
    System.arraycopy(buf, lo, buf, lo + 1, keep - lo) // shift right, tail drops
    buf(lo) = x
    buf(0) = keep
    buf
  }

  /** Distinct-count estimate from a KMV buffer: exact below k, the
    * Bar-Yossef estimator at k. */
  def estimate(buf: Array[Long], k: Int): Double = {
    val n = buf(0).toInt
    if (n < k) n.toDouble else (k - 1).toDouble * HashSpace / buf(k)
  }

  /** Column form of [[estimate]] over a k-min-values ARRAY column — the
    * single definition both the batch query and the windowed streaming
    * twin use (three independent encodings of the estimator would drift). */
  def estimateCol(hs: Column, k: Int): Column = {
    val numer = (k - 1).toDouble * HashSpace // small-int × 2^60: exact double
    when(size(hs) === k, lit(numer) / element_at(hs, k))
      .otherwise(size(hs).cast("double"))
  }

  /** [[estimateCol]]'s companion: the k-th hash when the sketch is full
    * (NULL below k — the estimate is exact there). */
  def kthHashCol(hs: Column, k: Int): Column =
    when(size(hs) === k, element_at(hs, k))

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
    // The sketch and the exact audit aggregate SEPARATELY and join on the
    // (tiny) group key: combining countDistinct into the same agg makes
    // Spark run every other aggregate's partial stage keyed by
    // (group, item) — one MinK buffer PER DISTINCT ITEM instead of per
    // group (~1000x the buffer churn; measured ~2x on q60). Exact
    // countDistinct semantics throughout: null ITEMS are skipped (they
    // would kill the udaf's primitive-Long input encoder) but every group
    // still reports — the exact side sees all rows, the sketch side left-
    // joins back null-safely (so null GROUP keys and all-null-item groups
    // both appear, with an empty sketch for the latter).
    val sketch = items.where(itemCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(kMinValues(k)(Sampling.portableHash(itemCol)).as("hs"))
    val exact = items
      .groupBy(col(groupCol))
      .agg(countDistinct(itemCol).as("n_exact"))
    val hs = coalesce(col("s.hs"), array().cast("array<bigint>"))
    exact.as("e").join(sketch.as("s"),
        col(s"e.$groupCol") <=> col(s"s.$groupCol"), "left_outer")
      .select(
        col(s"e.$groupCol").as(groupCol),
        col("n_exact"),
        size(hs).cast("long").as("n_sketch"),
        kthHashCol(hs, k).as("kth_hash"),
        estimateCol(hs, k).as("est_distinct"))
  }

  /** Pairwise audience OVERLAP between groups via theta-sketch
    * intersection over the KMV sketches (Dasgupta et al.'s theta-sketch
    * framework restricted to KMV): for groups a < b,
    * theta = min(theta_a, theta_b) (a full sketch's k-th hash, else the
    * whole 2^60 hash space), S = shared sketch hashes below theta, and
    * |A ∩ B| ≈ |S| / (theta / 2^60) — reported as `est_milli` through one
    * decimal(38) product (|S| ≤ k, so |S|·2^60·1000 < 10^26). Exact when
    * both sketches are below k. The exact intersection rides along as
    * `n_exact` with `err_ppm`, the accuracy audit (same contract as
    * [[kmvDistinct]]).
    *
    * Scale shape: one KMV aggregation per group (bounded buffers), a
    * groups² sketch cross — groups is a small dimension by contract — and
    * the exact audit's item-keyed self-join, whose fan-out per item is
    * bounded by groups². Every estimate is a pure function of the input
    * multiset: deterministic, engine-portable, oracle-checkable. */
  def kmvIntersection(items: DataFrame, groupCol: String, itemCol: Column,
      k: Int): DataFrame = {
    val H = 1L << 60
    val sk = items.where(itemCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(kMinValues(k)(Sampling.portableHash(itemCol)).as("hs"))
      .select(col(groupCol).as("g"), col("hs"),
        coalesce(kthHashCol(col("hs"), k), lit(H)).as("theta"))
    val theta = least(col("a.theta"), col("b.theta"))
    val pairs = sk.as("a").join(sk.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("ga"), col("b.g").as("gb"), theta.as("theta"),
        size(filter(array_intersect(col("a.hs"), col("b.hs")),
          h => h < theta)).cast("long").as("s_cnt"))
    val di = items.where(itemCol.isNotNull)
      .select(col(groupCol).as("g"), itemCol.as("item")).distinct()
    val exact = di.as("x")
      .join(di.as("y"), col("x.item") === col("y.item") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("ga"), col("y.g").as("gb"))
      .agg(count(lit(1)).as("n_exact"))
    pairs.join(exact, Seq("ga", "gb"), "left_outer")
      .select(col("ga"), col("gb"),
        expr(s"cast((cast(s_cnt as decimal(38,0)) * $H * 1000) div theta as bigint)")
          .as("est_milli"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .withColumn("err_ppm",
        when(col("n_exact") > 0,
          expr("abs(est_milli div 1000 - n_exact) * 1000000 div n_exact")))
  }

  // --- Count-Min sketch (frequency estimation) ---------------------------
  //
  // Same determinism argument as KMV: each of the depth×width counters is a
  // plain SUM over rows selected by the portable hash, so the sketch state
  // and every estimate are pure functions of the input multiset —
  // independent of partitioning and engine, hence oracle-checkable
  // bit-for-bit (where approx sketches with engine-private hashing are not).
  // Guarantees: estimate >= true count always (counters only over-count on
  // collisions); with width w the expected overcount is N/w per row, and
  // taking the MIN over `depth` independent rows drives the error of any
  // single collision-heavy row down exponentially (Cormode & Muthukrishnan
  // 2005).

  /** Per-(row, bucket) hash for the CM sketch: the portable 60-bit hash of
    * `"j:item"` — depth independent hash functions from one md5 family,
    * reproducible in DuckDB as
    * `CAST(('0x'||substring(md5(j||':'||item),1,15)) AS BIGINT) % width`. */
  def cmsBucket(rowIdx: Column, item: Column, width: Int): Column =
    pmod(Sampling.portableHash(concat_ws(":", rowIdx, item)), lit(width))

  /** Count-Min counter table over an item column: `(j, bucket, c)` with
    * exactly depth×width rows (absent combinations count 0).
    *
    * Scale shape: one map-side explode (×depth) then a single aggregation
    * keyed by (j, bucket) — partial aggregation collapses every partition
    * to ≤ depth×width counters before the exchange, so shuffle traffic is
    * O(depth×width) per partition regardless of row count. The result is a
    * bounded table (e.g. 4×1024 rows) that downstream estimation
    * BROADCASTS — at 100 TB the counters still fit in one executor page. */
  def cmsCounters(items: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame =
    items.select(itemCol.as("item"))
      .where(col("item").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("item"))
      .groupBy(col("j"), cmsBucket(col("j"), col("item"), width).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Equi-join cardinality estimation from two Count-Min tables — the
    * AMS/CMS inner-product estimator (Alon-Matias-Szegedy second moments;
    * Cormode & Muthukrishnan's CM sketch paper, §4.2): the true join size
    * |A ⋈ B on key| is the frequency-vector inner product Σ_v fA(v)·fB(v);
    * each depth row estimates it as Σ_w a[j][w]·b[j][w], which
    * OVER-estimates (hash collisions add non-negative cross terms), so the
    * per-row MIN is the estimate. The cost-based-planning primitive: size
    * a prospective shuffle join from two bounded sketches instead of
    * scanning either side twice.
    *
    * Returns one row per depth row: (j, est, joint min over rows as
    * est_min) — all integer (counter products summed as BIGINT; bound:
    * Σ ca·cb ≤ max_f · N < 2^63 for N < ~3e9 heavy-side rows). Both
    * counter tables are depth×width aggregates (the [[cmsCounters]] scale
    * argument); the estimator join is keyed by (j, bucket) — counter-table
    * sized, metadata at any corpus scale. */
  def cmsJoinSizeEstimate(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column,
      depth: Int, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = cmsCounters(a, aCol, depth, width)
      .select(col("j"), col("bucket"), col("c").as("ca"))
    val cb = cmsCounters(b, bCol, depth, width)
      .select(col("j"), col("bucket"), col("c").as("cb"))
    ca.join(cb, Seq("j", "bucket"))
      .groupBy(col("j").cast("long").as("j"))
      .agg(sum(col("ca") * col("cb")).as("est"))
      .withColumn("est_min", min(col("est")).over(Window.partitionBy()))
  }

  /** Point-frequency estimates for `candidates(itemCol)` from a
    * [[cmsCounters]] table: min over the depth counters each candidate
    * hashes to. The counter table is broadcast (bounded size), so the
    * probe is a map-side join + a per-candidate min — candidates never
    * shuffle by bucket. */
  def cmsEstimate(candidates: DataFrame, counters: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = candidates
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col(itemCol), width))
    // left join: a probed bucket absent from the counter table means no row
    // ever hashed there — the estimate for such a candidate is exactly 0
    probes.join(broadcast(counters), Seq("j", "bucket"), "left_outer")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  // --- Misra-Gries frequent-items summary (heavy-hitter candidates) ------
  //
  // The third sketch family: where KMV answers "how many distinct?" and CM
  // answers "how often is THIS item?", Misra-Gries answers "WHICH items are
  // frequent?" without knowing them in advance — the top-k discovery
  // problem CM cannot solve (it can only probe known candidates, q82).
  //
  // The summary is k counters. Unlike KMV/CM its STATE is order- and
  // partitioning-dependent, so there is no bit-exact oracle for the raw
  // sketch; what IS deterministic are its guarantees (Misra & Gries 1982;
  // merge soundness: Agarwal et al., "Mergeable Summaries", PODS 2012):
  //   G1  c(x) <= f(x)                          (never over-counts)
  //   G2  f(x) - c(x) <= (n - S) / (k + 1)      (S = sum of kept counters)
  //   G3  every x with f(x) > n/(k+1) is tracked (from G2: its counter > 0)
  // [[guaranteedHeavyHitters]] turns G3 into an oracle-checkable operator:
  // the sketch proposes <= k candidates, a bounded exact recount keeps
  // exactly {x : f(x)*(k+1) > n} — a deterministic set with exact counts,
  // independent of how the sketch arrived at its candidates.

  /** Misra-Gries aggregator with k counters. Per-row cost O(1) map ops;
    * the decrement-all step on a full buffer is O(k) but each such step
    * retires k+1 units of count mass, so total work is O(rows + rows/k · k)
    * = O(rows) amortized. Merge (sum counters, subtract the (k+1)-th
    * largest, drop non-positive) preserves G1/G2, so Spark may combine
    * partials in any order and the GUARANTEES hold — the VALUES may differ
    * by partitioning, which is why downstream consumers must recount
    * (see [[guaranteedHeavyHitters]]). */
  final class FreqItems(k: Int) extends Aggregator[String, FreqBuf, FreqBuf] {
    override def zero: FreqBuf = FreqBuf(0L, Map.empty)

    override def reduce(b: FreqBuf, x: String): FreqBuf = b.counts.get(x) match {
      case Some(c) => FreqBuf(b.n + 1, b.counts.updated(x, c + 1))
      case None if b.counts.size < k => FreqBuf(b.n + 1, b.counts.updated(x, 1L))
      case None => // decrement-all: retires one unit of x and of every counter
        FreqBuf(b.n + 1, b.counts.collect { case (i, c) if c > 1 => i -> (c - 1) })
    }

    override def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
      val sum = b.counts.foldLeft(a.counts) { case (m, (x, c)) =>
        m.updated(x, m.getOrElse(x, 0L) + c)
      }
      val pruned =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all; at most k survive
          val delta = sum.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
          sum.collect { case (i, c) if c > delta => i -> (c - delta) }
        }
      FreqBuf(a.n + b.n, pruned)
    }

    override def finish(r: FreqBuf): FreqBuf = r

    override def bufferEncoder: Encoder[FreqBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FreqBuf]()
    override def outputEncoder: Encoder[FreqBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FreqBuf]()
  }

  /** Column form: `freqItems(k)(itemCol)` in `agg` — returns a struct
    * `(n, counts)` with at most k candidate counters. */
  def freqItems(k: Int): Column => Column = {
    val agg = udaf(new FreqItems(k), Encoders.STRING)
    (item: Column) => agg(item)
  }

  /** The deterministic heavy-hitter operator: exactly
    * `{x : f(x) * (k+1) > n}` with exact counts, found WITHOUT an exact
    * group-by over the full item domain.
    *
    * Two passes: (1) one Misra-Gries aggregation — map-side partials are
    * bounded at k counters per partition, the exchange moves O(k) per
    * partition, never the vocabulary; (2) the <= k candidates broadcast
    * back over the stream for an exact recount (map-side semi-probe +
    * one bounded aggregation), and the integer-exact cut
    * `n_exact * (k+1) > n` keeps precisely the true heavy hitters that G3
    * proves are all among the candidates. At 100 TB the vocabulary never
    * shuffles — only 2 scans, k counters per partition, and k recount
    * rows move. */
  def guaranteedHeavyHitters(items: DataFrame, itemCol: Column, k: Int): DataFrame = {
    val tok = items.select(itemCol.as("item")).where(col("item").isNotNull)
    val sk = tok.agg(freqItems(k)(col("item")).as("sk"), count(lit(1)).as("n_total"))
    val cand = sk.select(explode(map_keys(col("sk.counts"))).as("item"), col("n_total"))
    tok.join(broadcast(cand), Seq("item"))
      .groupBy(col("item"), col("n_total"))
      .agg(count(lit(1)).as("n_exact"))
      .where(col("n_exact") * (k + 1) > col("n_total"))
      .select(col("item"), col("n_exact"), col("n_total"))
  }

  // --- HyperLogLog registers (mergeable distinct-count rollups) ----------
  //
  // The fourth sketch family. KMV (above) already answers "how many
  // distinct?" with O(k) state; HLL answers it with O(m) FIXED state
  // (m=64 six-bit registers here) and — the property KMV lacks — a
  // register array that rolls up by plain element-wise MAX: per-source
  // sketches merge into per-day, per-day into global, losslessly, with no
  // re-scan (Flajolet et al. 2007, "HyperLogLog: the analysis of a
  // near-optimal cardinality estimation algorithm"). Over the portable
  // 60-bit hash every register value M_j = max over the group's DISTINCT
  // hash set of rho(h) is a pure function of the input SET — independent
  // of partitioning, merge order, and engine — so the whole register
  // table AND the estimate are oracle-checkable bit-for-bit (the q60/q93
  // determinism argument, extended to HLL).
  //
  // Register split of the 60-bit hash: bucket = h mod 64 (low 6 bits),
  // remainder v = h >> 6 (54 bits), rho = 55 - bitlength(v) (v=0 -> 55):
  // the 1-based position of the first set bit scanning from the top of
  // the 54-bit field. bitlength via length(bin(v)) — `bin` exists with
  // identical no-leading-zeros semantics in Spark and DuckDB.
  //
  // Estimator: raw = alpha_64 * m^2 / sum_j 2^(-M_j). The sum of dyadics
  // is EXACT as one BIGINT: S = sum_j 2^(55 - M_j) (max 64 * 2^55 < 2^62,
  // and shifts stay <= 55 — DuckDB throws on 1<<63), so
  // raw = alpha_64 * 4096 * 2^55 / S with ONE double division — every op
  // correctly rounded, bit-exact cross-engine (no libm). The small-range
  // regime (zero registers present, raw <= 2.5m) calls for linear
  // counting m*ln(m/V); ln is libm, so this operator reports est_distinct
  // only in the raw regime (V=0) and NULL otherwise, with v_zero exposed
  // so consumers see which regime they are in. At pipeline scale
  // (distinct >> 160) V=0 always holds; below that the KMV sketch is the
  // right tool anyway (exact under k).

  /** Number of HLL registers (2^6). */
  val HllM = 64

  /** rho(h): 1-based first-set-bit position of the 54-bit remainder field,
    * counted from the top; 55 when the field is all zeros. */
  def hllRho(h: Column): Column = {
    val v = shiftright(h, 6)
    when(v === 0L, lit(55)).otherwise(lit(55) - length(bin(v)))
  }

  /** JVM mirror of [[hllRho]] (pinned equal in SketchesSpec) — the
    * streaming twin's per-row path. */
  def hllRhoJvm(h: Long): Int = {
    val v = h >>> 6
    if (v == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(v))
  }

  /** JVM mirror of the raw-estimate expression in [[hllDistinct]]: the
    * identical literal fold, so stream and batch estimates bit-match. */
  def hllRawEstimate(sSum: Long): Double =
    0.709 * 4096.0 * 3.6028797018963968e16 / sSum.toDouble

  /** Sparse per-group HLL registers over `itemCol`'s portable hash:
    * `grp | bucket | m` for OCCUPIED buckets (absent buckets are 0).
    *
    * Scale shape: one aggregation keyed by (grp, bucket) with map-side
    * partial MAX — every partition collapses to <= 64 rows per group
    * before the exchange; per-group state is 64 small ints forever. */
  def hllRegisters(items: DataFrame, groupCol: Column, itemCol: Column): DataFrame =
    items.where(itemCol.isNotNull)
      .select(groupCol.as("grp"), Sampling.portableHash(itemCol).as("h"))
      .groupBy(col("grp"), pmod(col("h"), lit(HllM.toLong)).as("bucket"))
      .agg(max(hllRho(col("h"))).as("m"))

  /** Per-group HLL distinct-count report with a merged `__all__` rollup
    * row proving register mergeability (element-wise max), plus the exact
    * distinct count as the accuracy audit (drop it in production — it
    * costs the distinct expand this sketch exists to avoid).
    *
    * Output: grp | v_zero | s_sum | raw_est | est_distinct | n_exact. */
  def hllDistinct(items: DataFrame, groupCol: String, itemCol: Column): DataFrame = {
    val regs = hllRegisters(items, col(groupCol), itemCol)
    // rollup = element-wise max of the per-group registers: the merge is
    // ANOTHER max aggregation over the bounded register table, never a
    // re-scan of the data.
    val allRegs = regs.unionByName(
      regs.groupBy(col("bucket")).agg(max(col("m")).as("m"))
        .select(lit("__all__").as("grp"), col("bucket"), col("m")))
    // dense fill: groups x 64 buckets is metadata-sized by construction
    val dense = allRegs.select(col("grp")).distinct()
      .select(col("grp"), explode(sequence(lit(0L), lit(HllM - 1L))).as("bucket"))
      .join(allRegs, Seq("grp", "bucket"), "left_outer")
      .select(col("grp"), coalesce(col("m"), lit(0)).as("m"))
    val agg = dense.groupBy(col("grp"))
      .agg(
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("v_zero"),
        sum(expr("shiftleft(1L, 55 - m)")).as("s_sum"))
    val exact = items
      .groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(itemCol).as("n_exact"))
      .unionByName(items.agg(countDistinct(itemCol).as("n_exact"))
        .select(lit("__all__").as("grp"), col("n_exact")))
    // alpha_64 * m^2 * 2^55, folded left-to-right in doubles — identical
    // literal tree in the DuckDB oracle, so the one division bit-matches
    val rawEst = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
      col("s_sum").cast("double")
    agg.join(exact, Seq("grp"))
      .select(col("grp"), col("v_zero"), col("s_sum"),
        rawEst.as("raw_est"),
        when(col("v_zero") === 0, rawEst).as("est_distinct"),
        col("n_exact"))
  }

  /** KMV SET ALGEBRA between groups: for every group pair (a < b), the
    * sketch-estimated union, intersection, and Jaccard of their distinct
    * item sets, from the SAME k-min-values sketches [[kmvDistinct]]
    * builds — the mergeability KMV has that exact distinct counts lack
    * (union sketch = k smallest of the pooled hash sets; intersection by
    * inclusion–exclusion; Beyer et al. 2007). Everything downstream of
    * the per-group sketch is a groups²-sized frame of k-long arrays —
    * pair math never touches the item stream, which is why this is the
    * 100 TB shape for "how much do these N crawls overlap" (q141's exact
    * matrix re-scans shingles; this answers from sketch state alone).
    * The exact intersection count rides along as the accuracy audit
    * (group-pair cardinality is small by construction; the estimator is
    * a pure function of the input multiset, so even estimates are
    * oracle-checkable bit-for-bit — the q60 discipline). */
  def kmvSetAlgebra(items: DataFrame, groupCol: String, itemCol: Column,
      k: Int): DataFrame = {
    // distinct (grp, item) is the ground set; the sketch path further
    // dedups to (grp, h) so a (vanishingly unlikely) 60-bit collision
    // between two items of one group can't duplicate a sketch entry,
    // while the EXACT audit joins on the REAL item value — a cross-group
    // hash collision must not inflate the count the docs present as the
    // accuracy oracle (the kmvIntersection discipline).
    val ground = graft.ext.PinnedCache.pin(items.where(itemCol.isNotNull)
      .select(col(groupCol).as("grp"), itemCol.as("it"))
      .distinct()
      .withColumn("h", Sampling.portableHash(col("it"))))
    val hashed = ground.select(col("grp"), col("h")).distinct()
    val sk = hashed.groupBy(col("grp")).agg(kMinValues(k)(col("h")).as("hs"))
    val pairs = sk.select(col("grp").as("grp_a"), col("hs").as("ha"))
      .join(sk.select(col("grp").as("grp_b"), col("hs").as("hb")),
        col("grp_a") < col("grp_b"))
    val unionHs = slice(array_sort(array_distinct(concat(col("ha"), col("hb")))), 1, k)
    val exactInter = ground.select(col("grp").as("grp_a"), col("it"))
      .join(ground.select(col("grp").as("grp_b"), col("it")), Seq("it"))
      .where(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    pairs
      .withColumn("est_a", estimateCol(col("ha"), k))
      .withColumn("est_b", estimateCol(col("hb"), k))
      .withColumn("est_union", estimateCol(unionHs, k))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)))
      .join(exactInter, Seq("grp_a", "grp_b"), "left_outer")
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"))
  }

  /** SLIDING-WINDOW HLL: per (group, occupied week), the distinct-count
    * estimate over the trailing `windowWeeks` weeks — the "distinct users
    * in the last 28 days, every day" shape that exact distincts cannot
    * sustain at scale (every window re-expands the stream) but register
    * merge gets for free: week registers are built ONCE, then each
    * register row fans out to the <= windowWeeks window ends it serves
    * and merges by per-bucket MAX — pure rollup-table math, the
    * [[hllDistinct]] mergeability argument applied along time. Exact
    * trailing distincts ride along as the audit (drop in production).
    * Only weeks the group actually occupies report (a silent week has no
    * window end here; emit-all-weeks is a dense-fill away). */
  def slidingHllDistinct(events: DataFrame, groupCol: String, itemCol: Column,
      tsNanosCol: String, windowWeeks: Int,
      weekNs: Long = 604800000000000L): DataFrame = {
    require(windowWeeks >= 1 && windowWeeks <= 64, "windowWeeks in [1,64]")
    val base = graft.ext.PinnedCache.pin(events.where(itemCol.isNotNull)
      .select(col(groupCol).as("grp"), expr(s"$tsNanosCol div ${weekNs}L").as("wk"),
        itemCol.as("it"), Sampling.portableHash(itemCol).as("h")))
    val occupied = base.select(col("grp"), col("wk")).distinct()
    val regs = base
      .groupBy(col("grp"), col("wk"), pmod(col("h"), lit(HllM.toLong)).as("bucket"))
      .agg(max(hllRho(col("h"))).as("m"))
    val merged = regs
      .select(col("grp"),
        explode(sequence(col("wk"), col("wk") + (windowWeeks - 1))).as("wk"),
        col("bucket"), col("m"))
      .join(occupied, Seq("grp", "wk"), "left_semi")
      .groupBy(col("grp"), col("wk"), col("bucket")).agg(max(col("m")).as("m"))
    val dense = occupied
      .select(col("grp"), col("wk"),
        explode(sequence(lit(0L), lit(HllM - 1L))).as("bucket"))
      .join(merged, Seq("grp", "wk", "bucket"), "left_outer")
      .select(col("grp"), col("wk"), coalesce(col("m"), lit(0)).as("m"))
    val agg = dense.groupBy(col("grp"), col("wk"))
      .agg(sum(when(col("m") === 0, 1L).otherwise(0L)).as("v_zero"),
        sum(expr("shiftleft(1L, 55 - m)")).as("s_sum"))
    val exact = base.select(col("grp"), col("wk"), col("it")).distinct()
      .select(col("grp"),
        explode(sequence(col("wk"), col("wk") + (windowWeeks - 1))).as("wk"),
        col("it"))
      .join(occupied, Seq("grp", "wk"), "left_semi")
      .groupBy(col("grp"), col("wk")).agg(countDistinct(col("it")).as("n_exact"))
    val rawEst = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
      col("s_sum").cast("double")
    agg.join(exact, Seq("grp", "wk"))
      .select(col("grp"), col("wk"), col("v_zero"), col("s_sum"),
        rawEst.as("raw_est"),
        when(col("v_zero") === 0, rawEst).as("est_distinct"),
        col("n_exact"))
  }

  /** EXACT distinct count over a BOUNDED non-negative integer id domain
    * via bitmask packing — the multiSourceBfs value-packing lesson as a
    * reusable aggregate: ids pack 64-per-long into (group, id div 64)
    * words combined with a map-side `bit_or`, then one `bit_count` sum
    * per group. Where `count(distinct id)` shuffles every distinct
    * (group, id) PAIR (8 bytes per id), this shuffles ⌈occupied-domain/64⌉
    * words per group — a 64× exchange reduction in the dense regime
    * (bounded user/item id spaces, the dashboard-DAU shape), and both
    * phases stay partial-agg combinable. Bit 63 is safe: only bit_or /
    * bit_count touch the words (the MultiSourceBfsSpec sign-bit rule).
    * For UNBOUNDED or sparse domains use [[hllDistinct]]/[[kmvDistinct]]
    * — a bitmap over a sparse range holds one id per word and the
    * packing buys nothing. The non-negative domain is ENFORCED with
    * raise_error (the shiftedQppm loud-corruption discipline): a
    * negative id would make `id % 64` negative, handing shiftleft a
    * negative shift count while `id div 64` floors — silently wrong
    * counts instead of a loud failure. Output: (grp, n_distinct,
    * n_words). */
  def bitmapDistinct(df: DataFrame, groupCol: String, id: Column): DataFrame = {
    val words = df
      .select(col(groupCol).as("grp"), id.cast("long").as("id"))
      .select(col("grp"),
        expr("case when id < 0L then cast(raise_error(" +
          "'bitmapDistinct: negative id outside the documented non-negative domain') as bigint) " +
          "else id end").as("id"))
      .select(col("grp"), expr("id div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(id % 64 as int))").as("bit"))
      .groupBy(col("grp"), col("w"))
      .agg(expr("bit_or(bit)").as("mask"))
    words.groupBy(col("grp"))
      .agg(sum(expr("bit_count(mask)")).cast("long").as("n_distinct"),
        count(lit(1)).as("n_words"))
  }
}
