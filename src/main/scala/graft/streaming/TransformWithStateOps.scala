package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Spark-4-native stateful operators on `transformWithState` — keyed value
  * state AND per-key timers in one API, the direct analog of the engine's
  * state nodes + `TimerManager` (SURVEY.md E3/E7; reference
  * `beavers/dag.py:95-154,501-518`). Requires the RocksDB state store
  * provider. */
object TransformWithStateOps {

  final case class KeyedEvent(key: String, eventTimeMs: Long)
  final case class SessionResult(key: String, events: Long, lastEventMs: Long)

  /** Per-key inactivity sessions: accumulate a count per key; (re)arm an
    * event-time timer `gapMs` past the latest event (one upcoming timer per
    * key, like `TimerManager`); when the watermark passes it, emit the
    * session and clear state. */
  final class InactivitySessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, KeyedEvent, SessionResult] {

    @transient private var counts: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[(Long, Long)](
        "counts", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[SessionResult] = {
      val prev = if (counts.exists()) counts.get() else (0L, 0L)
      var n = prev._1
      var lastTs = prev._2
      rows.foreach { r => n += 1; lastTs = math.max(lastTs, r.eventTimeMs) }
      counts.update((n, lastTs))
      // one upcoming timer per key: clear any previous, arm at last+gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(lastTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionResult] = {
      val out =
        if (counts.exists()) Iterator.single(SessionResult(key, counts.get()._1, counts.get()._2))
        else Iterator.empty
      counts.clear()
      out
    }
  }

  /** Wire the processor into a stream keyed by `key` with an event-time
    * watermark already applied to `eventTimeMs`'s source column. */
  def inactivitySessions(ds: Dataset[KeyedEvent], gapMs: Long): Dataset[SessionResult] = {
    implicit val outEnc: Encoder[SessionResult] = Encoders.product[SessionResult]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new InactivitySessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  final case class GroupToken(grp: String, w: String)
  final case class GroupTopK(grp: String, w: String, c: Long, rk: Long)

  /** Continuous per-group top-k (q61's streaming twin): exact token counts
    * in `MapState` keyed by group, refreshed top-k emitted for every group
    * a micro-batch touches (untouched groups emit nothing — the
    * reference's only-changed-keys propagation contract).
    *
    * State shape at scale: one map per group, sized by that group's
    * vocabulary — the same asymptotics as the batch counts table q61
    * aggregates, but sharded by group key across the state store (RocksDB)
    * instead of materialized per query. Per batch, cost is
    * O(vocab log vocab) for TOUCHED groups only; the input stream itself
    * never re-aggregates. Production variants can swap the exact map for
    * the bounded Misra-Gries summary ([[graft.ext.Sketches.FreqItems]])
    * when per-group vocabularies are unbounded. */
  final class GroupTopKProcessor(k: Int)
      extends StatefulProcessor[String, GroupToken, GroupTopK] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[GroupToken],
        timerValues: TimerValues): Iterator[GroupTopK] = {
      rows.foreach { r =>
        val prev = if (counts.containsKey(r.w)) counts.getValue(r.w) else 0L
        counts.updateValue(r.w, prev + 1L)
      }
      // q61's ordering exactly: count desc, token asc, rank 1..k
      counts.iterator().toArray
        .sortBy { case (w, c) => (-c, w) }
        .take(k).iterator.zipWithIndex
        .map { case ((w, c), i) => GroupTopK(key, w, c, i + 1L) }
    }
  }

  def groupTopK(ds: Dataset[GroupToken], k: Int): Dataset[GroupTopK] = {
    implicit val outEnc: Encoder[GroupTopK] = Encoders.product[GroupTopK]
    ds.groupByKey(_.grp)(Encoders.STRING)
      .transformWithState(new GroupTopKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  final case class SourceGram(src: String, g: String)
  final case class BoilerCand(source: String, gram: String, lb: Long, n: Long)

  /** Continuous per-source boilerplate candidates — the streaming twin of
    * [[graft.ext.CorpusMining.boilerplate]], closing the one gap that kept
    * the batch op batch-only: a crawl's per-source gram vocabulary is
    * UNBOUNDED, so exact `MapState` counting (the [[GroupTopKProcessor]]
    * shape) would grow state without limit. Instead each source keeps ONE
    * Misra-Gries summary ([[graft.ext.Sketches.FreqItems]]) of its n-gram
    * stream in `ValueState`: k counters + a total, fixed size forever.
    * The processor calls the batch aggregator's own `reduce` — the two
    * paths share transition functions, so the sketch guarantees (G1
    * counters never overcount beyond the shared bound; G3 every gram with
    * f·(k+1) > n is tracked) hold verbatim; `TransformWithStateSpec`
    * asserts both against an exact recount across batch splits.
    *
    * Every micro-batch re-emits the full candidate list for TOUCHED
    * sources only (the reference's only-changed-keys propagation
    * contract), ordered by counter desc then gram, with the counter as
    * the count lower bound and the source's running gram total `n`.
    * Downstream consumers needing exact counts recount the ≤ k candidates
    * (the q98 `guaranteedHeavyHitters` pattern) — candidates are bounded,
    * so the recount broadcast-probes. */
  final class BoilerplateProcessor(k: Int)
      extends StatefulProcessor[String, SourceGram, BoilerCand] {

    private val mg = new graft.ext.Sketches.FreqItems(k)
    @transient private var sk: ValueState[graft.ext.FreqBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[graft.ext.FreqBuf](
        "sk", Encoders.product[graft.ext.FreqBuf], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SourceGram],
        timerValues: TimerValues): Iterator[BoilerCand] = {
      var buf = if (sk.exists()) sk.get() else mg.zero
      rows.foreach(r => buf = mg.reduce(buf, r.g))
      sk.update(buf)
      buf.counts.toArray.sortBy { case (g, c) => (-c, g) }.iterator
        .map { case (g, c) => BoilerCand(key, g, c, buf.n) }
    }
  }

  final case class ShardedKey(shard: Int, key: String)
  final case class SeenFlag(key: String, dup: Boolean)

  /** Streaming "seen before?" dedup with FIXED state on an unbounded
    * stream — the Bloom tradeoff moved into the state store: exact
    * streaming dedup ([[Streaming.streamingDedup]]-style keyed state)
    * grows with the distinct-key count forever, while this holds m bits
    * per shard regardless of stream length, never misses a true repeat
    * (no false negatives), and flags a bounded false-positive fraction of
    * first-sights as dups (~(1-e^{-jn/m})^j). The bit layout is EXACTLY
    * [[graft.operators.BloomJoin]]'s (md5 double-hash via
    * `positionsJvm`, pinned equal to the Column form in its spec), so a
    * filter primed by the batch aggregate and one built row-by-row here
    * are interchangeable. State is a SPARSE word map (occupied words
    * only, <= m/64 entries) — the [[GridQuantilesProcessor]] bound style.
    * Shard keys ([[ShardedKey.shard]] = any stable hash of the key) to
    * spread the filters across the state store. */
  final class BloomDedupProcessor(m: Int, j: Int)
      extends StatefulProcessor[Int, ShardedKey, SeenFlag] {

    @transient private var words: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      words = getHandle.getMapState[Long, Long](
        "words", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[ShardedKey],
        timerValues: TimerValues): Iterator[SeenFlag] = {
      rows.map { r =>
        val pos = graft.operators.BloomJoin.positionsJvm(r.key, m, j)
        var dup = true
        var i = 0
        while (i < pos.length) {
          val w = pos(i) >> 6
          val bit = 1L << (pos(i) & 63L).toInt
          val cur = if (words.containsKey(w)) words.getValue(w) else 0L
          if ((cur & bit) == 0L) { dup = false; words.updateValue(w, cur | bit) }
          i += 1
        }
        SeenFlag(r.key, dup)
      }
    }
  }

  def streamingBloomDedup(ds: Dataset[ShardedKey], m: Int, j: Int): Dataset[SeenFlag] = {
    implicit val outEnc: Encoder[SeenFlag] = Encoders.product[SeenFlag]
    ds.groupByKey(_.shard)(Encoders.scalaInt)
      .transformWithState(new BloomDedupProcessor(m, j),
        TimeMode.None(), OutputMode.Update())
  }

  final case class SourceDoc(source: String, text: String)
  final case class FunnelCounts(source: String, total: Long, dropped: Long, kept: Long)

  /** Live per-source Gopher-gate attrition counters — the streaming half
    * of the batch curation funnel (q113/q114): as documents stream in,
    * each source's (total, dropped, kept) counters update via the JVM
    * mirror of the EXACT integer rules the batch operator applies
    * ([[graft.ext.TextAnalysis.gopherKeepJvm]], pinned equal in the
    * spec), so a dashboard watches gate attrition in real time and the
    * nightly batch report reconciles to the same numbers. State: two
    * longs per source. Emits refreshed counters for touched sources only
    * (the only-changed-keys contract). */
  final class GopherFunnelProcessor
      extends StatefulProcessor[String, SourceDoc, FunnelCounts] {

    @transient private var counts: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[(Long, Long)](
        "counts", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SourceDoc],
        timerValues: TimerValues): Iterator[FunnelCounts] = {
      var (total, kept) = if (counts.exists()) counts.get() else (0L, 0L)
      rows.foreach { r =>
        total += 1
        if (graft.ext.TextAnalysis.gopherKeepJvm(r.text)) kept += 1
      }
      counts.update((total, kept))
      Iterator.single(FunnelCounts(key, total, total - kept, kept))
    }
  }

  def streamingGopherFunnel(ds: Dataset[SourceDoc]): Dataset[FunnelCounts] = {
    implicit val outEnc: Encoder[FunnelCounts] = Encoders.product[FunnelCounts]
    ds.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new GopherFunnelProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  final case class GroupValue(grp: String, v: Double)
  final case class QuantileRow(grp: String, n: Long, pct: Long, value: Double)

  /** Continuous per-group grid quantiles — the streaming twin of
    * [[graft.ext.Histogram.gridQuantiles]] (q103). State per group is the
    * bin-count map on the power-of-two grid: bounded by the OCCUPIED bin
    * count (≤ domain × scale), never by the row count, so it is fixed-size
    * on an unbounded stream the same way the batch operator's shuffle is.
    * Bins merge by addition (the map IS a mergeable sketch), and the bin
    * id `floor(v · scale)` is the exact same IEEE-754-exact computation
    * the batch path and the DuckDB oracle use — so the final emission
    * equals the batch answer on the same rows regardless of how the
    * stream was batched (asserted in `TransformWithStateSpec`).
    *
    * Emits refreshed quantile rows (one per requested percent, ceil-rank
    * convention) for TOUCHED groups only — the reference's
    * only-changed-keys propagation contract. */
  final class GridQuantilesProcessor(scale: Int, percents: Seq[Int])
      extends StatefulProcessor[String, GroupValue, QuantileRow] {

    @transient private var bins: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bins = getHandle.getMapState[Long, Long](
        "bins", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[GroupValue],
        timerValues: TimerValues): Iterator[QuantileRow] = {
      rows.foreach { r =>
        val b = math.floor(r.v * scale).toLong // exact: scale is 2^k
        val prev = if (bins.containsKey(b)) bins.getValue(b) else 0L
        bins.updateValue(b, prev + 1L)
      }
      val sorted = bins.iterator().toArray.sortBy(_._1)
      val n = sorted.iterator.map(_._2).sum
      percents.iterator.map { p =>
        val target = (n * p + 99) / 100
        var cum = 0L
        var i = 0
        var hit = Long.MinValue
        while (i < sorted.length && hit == Long.MinValue) {
          cum += sorted(i)._2
          if (cum >= target) hit = sorted(i)._1
          i += 1
        }
        QuantileRow(key, n, p.toLong, hit / scale.toDouble)
      }
    }
  }

  def streamingGridQuantiles(ds: Dataset[GroupValue], scale: Int,
      percents: Seq[Int]): Dataset[QuantileRow] = {
    require(scale >= 1 && (scale & (scale - 1)) == 0, "scale must be a power of two")
    implicit val outEnc: Encoder[QuantileRow] = Encoders.product[QuantileRow]
    ds.groupByKey(_.grp)(Encoders.STRING)
      .transformWithState(new GridQuantilesProcessor(scale, percents),
        TimeMode.None(), OutputMode.Update())
  }

  /** Wire [[BoilerplateProcessor]] over a streaming `documents` frame:
    * split → n-gram explode (map-only, the batch op's exact gram
    * definition via [[graft.ext.TextAnalysis.ngramsFromTokens]]) → keyed
    * summary update. */
  def streamingBoilerplate(docs: org.apache.spark.sql.DataFrame, textCol: String,
      srcCol: String, n: Int, k: Int): Dataset[BoilerCand] = {
    import org.apache.spark.sql.functions._
    implicit val inEnc: Encoder[SourceGram] = Encoders.product[SourceGram]
    implicit val outEnc: Encoder[BoilerCand] = Encoders.product[BoilerCand]
    docs.select(col(srcCol).as("src"), split(col(textCol), " ").as("toks"))
      .select(col("src"), explode(graft.ext.TextAnalysis.ngramsFromTokens("toks", n)).as("g"))
      .as[SourceGram]
      .groupByKey(_.src)(Encoders.STRING)
      .transformWithState(new BoilerplateProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
