package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class Tick(ticker: String, price: Double, seq: Long)

/** Structured Streaming operator semantics over MemoryStream — the
  * continuous-query twins of the cycle-driver operators. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("streamingLastByKeys emits only touched keys per batch (W4 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = Streaming.streamingLastByKeys[Tick, String](
        input.toDS(), _.ticker, (a, b) => a.seq >= b.seq)
      .writeStream.format("memory").queryName("last_ticks")
      .outputMode("update").start()
    try {
      input.addData(Tick("A", 1.0, 1), Tick("A", 2.0, 2), Tick("B", 9.0, 1))
      drain(query)
      val batch1 = spark.table("last_ticks").as[Tick].collect().toSet
      assert(batch1 == Set(Tick("A", 2.0, 2), Tick("B", 9.0, 1)))

      input.addData(Tick("A", 3.0, 3)) // only A touched: B not re-emitted
      drain(query)
      val all = spark.table("last_ticks").as[Tick].collect().toSeq
      assert(all.count(_.ticker == "B") == 1)
      assert(all.filter(_.ticker == "A").map(_.seq).max == 3)

      input.addData(Tick("A", 99.0, 0)) // stale seq: ignored, nothing emitted
      drain(query)
      assert(spark.table("last_ticks").as[Tick].collect().toSeq.size == all.size)
    } finally query.stop()
  }

  test("running counts in update mode (kafka word-count streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val query = Streaming.runningCounts(input.toDF().withColumnRenamed("value", "word"), "word")
      .writeStream.format("memory").queryName("wcounts")
      .outputMode("update").start()
    try {
      input.addData("hello", "world", "hello")
      drain(query)
      val rows = spark.table("wcounts").as[(String, Long)].collect().toMap
      assert(rows == Map("hello" -> 2L, "world" -> 1L))
      input.addData("world")
      drain(query)
      // update mode re-emits only the changed key
      val emitted = spark.table("wcounts").as[(String, Long)].collect().toSeq
      assert(emitted.sortBy(r => (r._1, r._2)).lastOption.contains(("world", 2L)))
    } finally query.stop()
  }

  test("windowed sum with watermark (tumbling frequency bucketing)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val query = Streaming.windowedSum(df, "ts", "value", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wsums")
      .outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2023-01-01 01:10:00"), 1.0),
        (Timestamp.valueOf("2023-01-01 01:40:00"), 2.0),
        (Timestamp.valueOf("2023-01-01 02:05:00"), 10.0))
      drain(query)
      val rows = spark.table("wsums")
        .select(col("bucket_start").cast("string"), col("event_cnt"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(rows.exists(r => r._1.startsWith("2023-01-01 01:00") && r._2 == 2 && r._3 == 3.0))
      assert(rows.exists(r => r._1.startsWith("2023-01-01 02:00") && r._2 == 1 && r._3 == 10.0))
    } finally query.stop()
  }

  test("sliding windows overlap buckets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val query = Streaming.slidingSum(df, "ts", "value", "1 hour", "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("slide_sums")
      .outputMode("complete").start()
    try {
      input.addData((Timestamp.valueOf("2023-01-01 01:40:00"), 2.0))
      drain(query)
      // one event lands in two overlapping hourly windows
      val starts = spark.table("slide_sums")
        .select(col("bucket_start").cast("string")).as[String].collect().toSet
      assert(starts == Set("2023-01-01 01:00:00", "2023-01-01 01:30:00"))
    } finally query.stop()
  }

  test("session windows group by inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val df = input.toDF().toDF("key", "ts")
    val query = Streaming.sessionCounts(df, "ts", "key", "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sessions_sw")
      .outputMode("complete").start()
    try {
      input.addData(
        ("a", Timestamp.valueOf("2023-01-01 01:00:00")),
        ("a", Timestamp.valueOf("2023-01-01 01:05:00")), // same session
        ("a", Timestamp.valueOf("2023-01-01 02:00:00")), // new session
        ("b", Timestamp.valueOf("2023-01-01 01:00:00")))
      drain(query)
      val rows = spark.table("sessions_sw")
        .select(col("key"), col("event_cnt")).as[(String, Long)].collect().toSeq
      assert(rows.sorted == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
    } finally query.stop()
  }

  test("streamingCutoff suppresses unchanged values per key (E8 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = Streaming.streamingCutoff[Tick, String, Double](
        input.toDS(), _.ticker, _.price)
      .writeStream.format("memory").queryName("cutoff_ticks")
      .outputMode("update").start()
    try {
      input.addData(Tick("A", 1.0, 1), Tick("A", 1.0, 2), Tick("A", 2.0, 3))
      drain(query)
      val prices = spark.table("cutoff_ticks").as[Tick].collect().toSeq.map(_.price)
      assert(prices == Seq(1.0, 2.0)) // the duplicate 1.0 was suppressed
      input.addData(Tick("A", 2.0, 4)) // unchanged again: nothing emitted
      drain(query)
      assert(spark.table("cutoff_ticks").count() == 2)
    } finally query.stop()
  }

  test("streamingDedup passes first occurrence, drops cross-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = Streaming.streamingDedup(
        input.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
      drain(query)
      val ids1 = spark.table("dedup_docs").select("doc_id").as[Long].collect().toSet
      assert(ids1 == Set(1L, 2L)) // in-batch duplicate dropped
      input.addData((4L, "beta text"), (5L, "gamma text")) // cross-batch dup dropped
      drain(query)
      val ids2 = spark.table("dedup_docs").select("doc_id").as[Long].collect().toSet
      assert(ids2 == Set(1L, 2L, 5L))
    } finally query.stop()
  }

  test("streamingDedupBounded re-admits content after the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streaming.streamingDedupBounded(
        input.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").start()
    def ts(min: Long) = new Timestamp(min * 60000L)
    try {
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "alpha"))
      drain(query)
      // exactly ONE of the in-batch duplicates survives (which one is a
      // partition-order artifact, deliberately unasserted)
      assert(spark.table("dedup_bounded").count() == 1)
      // push the watermark far past the horizon, then the same content again
      input.addData((3L, ts(120), "beta"))
      drain(query)
      input.addData((4L, ts(121), "alpha")) // old alpha state expired -> re-admitted
      drain(query)
      val ids = spark.table("dedup_bounded").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(4L), s"expired duplicate must be re-admitted (got $ids)")
      assert(ids.size == 3)
    } finally query.stop()
  }

  test("streamingQualityFilter curates a stream with the batch scoring exprs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = Streaming.streamingQualityFilter(
        input.toDF().toDF("doc_id", "text"), "text", 0.3)
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs on"),
        (2L, "zz"))
      drain(query)
      val rows = spark.table("curated_docs").select("doc_id").as[Long].collect().toSet
      assert(rows == Set(1L)) // the low-quality doc is filtered out
    } finally query.stop()
  }

  test("streamingIncrementalNearDups: stream-static join matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (11L, "nine ten eleven twelve thirteen fourteen"),
      (12L, "one two three four five six seven eight")) // exact dup of 2
    val input = MemoryStream[(Long, String)]
    val query = Streaming.streamingIncrementalNearDups(
        input.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id")
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      fresh.grouped(2).foreach { b => input.addData(b: _*); drain(query) }
      // re-sending a doc must NOT re-emit its matches (cross-batch dedup state)
      input.addData(fresh.head); drain(query)
      val streamed = spark.table("inc_dedup")
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSeq
      val batch = graft.ext.Dedup.incrementalNearDups(
          fresh.toDF("doc_id", "text"), corpus, "text", "doc_id")
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSeq
      assert(streamed.sorted == batch.sorted) // same matches, emitted exactly once
      assert(streamed.toSet == Set((10L, 1L), (12L, 2L)))
    } finally query.stop()
  }

  test("streamingKmvDistinct matches the batch sketch on the same input set") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val input = MemoryStream[(String, String)] // (key, item)
    val hashed = input.toDS().toDF("grp", "item")
      .select(col("grp"), graft.ext.Sampling.portableHash(col("item")).as("h"))
      .as[(String, Long)]
    val query = Streaming.streamingKmvDistinct(hashed, k)
      .toDF("grp", "n_sketch", "est")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      val items = (0 until 120).map(i => ("g", s"item-${i % 57}")) // 57 distinct
      items.grouped(40).foreach { b => input.addData(b: _*); drain(query) }
      // the KMV estimate is MONOTONE NONDECREASING across batches (more
      // distinct values can only lower the kth min), so the max-est row IS
      // the final sketch state — n_sketch saturates at k and would tie
      val last = spark.table("kmv_stream").orderBy(col("est").desc).head
      val batch = graft.ext.Sketches.kmvDistinct(
          items.toDF("grp", "item"), "grp", col("item"), k).head
      assert(last.getLong(1) == batch.getAs[Long]("n_sketch"))
      assert(last.getDouble(2) == batch.getAs[Double]("est_distinct"))
    } finally query.stop()
  }

  test("streamingWindowedKmvDistinct: windowed sketch equals the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val k = 8
    val input = MemoryStream[(Timestamp, String)]
    val query = Streaming.streamingWindowedKmvDistinct(
        input.toDF().toDF("ts", "item"), "ts", col("item"), "1 hour", "0 seconds", k)
      .writeStream.format("memory").queryName("wkmv")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // hour 10: 12 distinct items (> k, estimator); hour 11: 3 distinct (exact)
      val h10 = (0 until 12).map(i => (t(10, i % 60), s"u$i"))
      val h11 = Seq((t(11, 0), "a"), (t(11, 1), "b"), (t(11, 2), "a"), (t(11, 3), "c"))
      (h10 ++ h11).grouped(5).foreach { b => input.addData(b: _*); drain(query) }
      val rows = spark.table("wkmv")
        .groupBy(col("bucket_start").cast("string").as("b"))
        .agg(max(col("n_sketch")).as("n"), max(col("est_distinct")).as("est"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // batch equivalent per window
      val batch = graft.ext.Sketches.kmvDistinct(
          (h10 ++ h11).toDF("ts", "item")
            .withColumn("h", date_trunc("hour", col("ts")).cast("string")),
          "h", col("item"), k)
        .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_sketch"),
          r.getAs[Double]("est_distinct")))).toMap
      assert(rows.keySet == batch.keySet)
      rows.foreach { case (w, got) => assert(got == batch(w), s"window $w") }
      assert(rows("2024-01-01 10:00:00")._1 == k)  // estimator branch exercised
      assert(rows("2024-01-01 11:00:00") == ((3L, 3.0)))
    } finally query.stop()
  }

  test("streamingAsofJoin enriches probes with the prevailing reference per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val query = Streaming.streamingAsofJoin(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: quote@100=5.0, trade@100 (inclusive), trade@205 after quote@200
      input.addData(
        AsofEvent(7L, 100L, 0, 10L, 5.0), AsofEvent(7L, 100L, 1, 1L, 0.0),
        AsofEvent(7L, 200L, 0, 11L, 6.0), AsofEvent(7L, 205L, 1, 2L, 0.0),
        AsofEvent(8L, 500L, 1, 3L, 0.0)) // no quote for key 8
      drain(query)
      val out1 = spark.table("asof_out").as[AsofMatch].collect().map(m => m.id -> m).toMap
      assert(out1(1L).asofTs.contains(100L) && out1(1L).asofValue.contains(5.0))
      assert(out1(2L).asofTs.contains(200L) && out1(2L).asofValue.contains(6.0))
      assert(out1(3L).asofTs.isEmpty && out1(3L).asofValue.isEmpty)

      // batch 2: state carried across batches; stale out-of-order quote ignored
      input.addData(
        AsofEvent(7L, 150L, 0, 12L, 9.9), // older than held quote@200: ignored
        AsofEvent(7L, 300L, 1, 4L, 0.0))
      drain(query)
      val out2 = spark.table("asof_out").as[AsofMatch].collect().map(m => m.id -> m).toMap
      assert(out2(4L).asofTs.contains(200L) && out2(4L).asofValue.contains(6.0))
    } finally query.stop()
  }

  test("streamingAsofJoin agrees with the batch AsofJoin under in-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    // adversarial ties: tiny key/ts domains, quotes and trades interleaved
    val rng = new scala.util.Random(42)
    val events = (0 until 60).map { i =>
      AsofEvent(k = rng.nextInt(3).toLong, ts = rng.nextInt(20).toLong * 10,
        side = rng.nextInt(2), id = i.toLong, value = rng.nextInt(100).toDouble)
    }.sortBy(e => (e.ts, e.side, e.id)) // in-order arrival (replay order)
    val input = MemoryStream[AsofEvent]
    val query = Streaming.streamingAsofJoin(input.toDS())
      .writeStream.format("memory").queryName("asof_agree")
      .outputMode("append").start()
    try {
      events.grouped(13).foreach { batch => input.addData(batch: _*); drain(query) }
      val streamed = spark.table("asof_agree").as[AsofMatch].collect()
        .map(m => m.id -> ((m.asofTs, m.asofValue))).toMap
      val trades = events.filter(_.side == 1)
        .map(e => (e.id, e.k, e.ts)).toDF("event_id", "k", "ts")
      val quotes = events.filter(_.side == 0)
        .map(e => (e.id, e.k, e.ts, e.value)).toDF("event_id", "k", "ts", "value")
      val batch = graft.operators.AsofJoin
        .asofJoin(trades, quotes, "k", "ts", "value", "event_id")
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
      assert(streamed.keySet == batch.keySet)
      // batch dedups equal-(key,ts) quotes by max tiebreaker; the stream holds
      // the LAST in sorted order = max id = same row, so results agree exactly
      streamed.foreach { case (id, got) => assert(got == batch(id), s"trade $id") }
    } finally query.stop()
  }

  test("streamingEventGaps: emitted gaps equal the batch lag multiset across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events: Seq[(String, Long)] =
      (1 to 40).map(i => ("u1", i * 137L)) ++ (1 to 25).map(i => ("u2", i * i * 11L))
    val ordered = events.sortBy(_._2)
    val input = MemoryStream[(String, Long)]
    val query = Streaming.streamingEventGaps(input.toDS())
      .toDF("k", "gap")
      .writeStream.format("memory").queryName("gaps_stream")
      .outputMode("update").start()
    try {
      ordered.grouped(17).foreach { b => input.addData(b: _*); drain(query) }
      val streamed = spark.table("gaps_stream")
        .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val batch = events.groupBy(_._1).view.mapValues { evs =>
        val ts = evs.map(_._2).sorted
        ts.zip(ts.tail).map { case (a, b) => b - a }.sorted
      }.toMap
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streamingCmsCounters: state-store merge equals the batch counter table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val query = Streaming.streamingCmsCounters(input.toDF().toDF("item"), col("item"), 4, 16)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val items = (0 until 300).map(i => s"w${i % 45}")
      items.grouped(100).foreach { b => input.addData(b: _*); drain(query) }
      val streamed = spark.table("cms_stream")
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      val batch = graft.ext.Sketches.cmsCounters(items.toDF("item"), col("item"), 4, 16)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streamingHourlyAnomalies: online flags match a single-pass reference across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two keys; "spiky" has a 40x hour at hr=6. Events as (key, hr) pairs.
    val events: Seq[(String, Long)] =
      (0 until 10).flatMap(h => Seq.fill(3)(("flat", h.toLong))) ++
        (0 until 9).flatMap(h => Seq.fill(2 + h % 3)(("spiky", h.toLong))) ++
        Seq.fill(80)(("spiky", 6L)) // arrives in-hour-order after sort below
    val ordered = events.sortBy(_._2)

    // single-pass reference: same moments + cut, computed in plain Scala
    def reference(seq: Seq[(String, Long)]): Map[(String, Long), (Long, Long)] = {
      val byKey = seq.groupBy(_._1)
      byKey.flatMap { case (k, evs) =>
        val counts = evs.groupBy(_._2).toSeq.sortBy(_._1).map { case (hr, b) => (hr, b.size.toLong) }
        var (h, s, q) = (0L, 0L, 0L)
        counts.dropRight(1).map { case (hr, n) => // last hour stays open
          h += 1; s += n; q += n * n
          val num = h * n - s; val den = h * q - s * s
          ((k, hr), (n, if (num * num > 4 * den) 1L else 0L))
        }
      }
    }
    val want = reference(ordered)

    val input = MemoryStream[(String, Long)]
    val query = Streaming.streamingHourlyAnomalies(input.toDS())
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("update").start()
    try {
      // split mid-hour AND mid-key: state must carry moments across batches
      ordered.grouped(37).foreach { b => input.addData(b: _*); drain(query) }
      val got = spark.table("anom_stream")
        .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(4)))).toMap
      assert(got == want)
      assert(got.exists { case ((k, hr), (_, f)) => k == "spiky" && hr == 6L && f == 1L },
        "the 40x hour must be flagged once closed")
    } finally query.stop()
  }

  test("streamingIntervalJoin: stream-stream pairs equal the batch +-window correlation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real events at micro precision (Spark event time is micro-grained)
    val raw = graft.replay.TsNanos.normalize(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def tsOf(us: Long) = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val errs = raw.filter(_._1 == "error").map(r => (r._2, tsOf(r._3))).toSeq
    val buys = raw.filter(_._1 == "purchase").map(r => (r._2, tsOf(r._3))).toSeq

    val eIn = MemoryStream[(Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.streamingIntervalJoin(
      eIn.toDF().toDF("err_id", "e_ts"), pIn.toDF().toDF("p_id", "p_ts"),
      "e_ts", "p_ts", 300L, "10 minutes")
      .select(col("err_id"), col("p_id"))
    val query = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      // interleaved multi-batch arrival
      (errs.grouped(errs.size / 3 + 1).toSeq
        .zipAll(buys.grouped(buys.size / 3 + 1).toSeq, Seq.empty, Seq.empty))
        .foreach { case (eb, pb) =>
          if (eb.nonEmpty) eIn.addData(eb: _*)
          if (pb.nonEmpty) pIn.addData(pb: _*)
          drain(query)
        }
      val got = spark.table("sjoin").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = 300000000L // 5 min in micros
      val eUs = raw.filter(_._1 == "error").map(r => r._2 -> r._3)
      val pUs = raw.filter(_._1 == "purchase").map(r => r._2 -> r._3)
      val want = (for {
        (ei, et) <- eUs; (pi, pt) <- pUs
        if pt >= et - w && pt <= et + w
      } yield (ei, pi)).toSet
      assert(want.nonEmpty && got == want)
      // State EVICTION: the range condition is interval arithmetic directly
      // on the watermarked timestamp columns, so StreamingJoinHelper derives
      // a state watermark and buffered rows age out (a unix_micros() form is
      // opaque to it and state grows unboundedly — the round-6 advisor
      // finding). One more batch at the stream tail re-evaluates the
      // watermark; the surviving join state must then be a ~15-minute
      // suffix of the month-long input, not the whole history.
      val totalIn = errs.size + buys.size
      val maxTs = tsOf(raw.map(_._3).max)
      eIn.addData((-1L, maxTs)); pIn.addData((-2L, maxTs)); drain(query)
      val stateRows = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows < totalIn / 2,
        s"join state must be evicted by the watermark: $stateRows rows buffered vs $totalIn input rows")
    } finally query.stop()
  }
}
