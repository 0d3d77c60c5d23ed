package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Conversion-funnel edge cases the oracle corpus may not cover: purchases
  * strictly before/at the anchor, window boundary inclusivity, multiple
  * conversions (min ttc), users missing either stage. */
class EventFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 100L

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, (Long, Boolean, Option[Long])] =
    EventFunnel.conversionFunnel(
        rows.toDF("user_id", "event_type", "ts"), "signup", "purchase", W)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap

  test("anchor is FIRST signup; window is (s, s+W]; min ttc wins; non-signups absent") {
    val rows: Seq[(Long, String, Long)] = Seq(
      // u1: second signup later; purchases: one at anchor (excluded, not >),
      // one inside (ttc 40), one later inside (ignored: min), one outside
      (1L, "signup", 1000L), (1L, "signup", 1500L),
      (1L, "purchase", 1000L), (1L, "purchase", 1040L),
      (1L, "purchase", 1090L), (1L, "purchase", 1101L),
      // u2: purchase exactly at the window edge s+W — INCLUDED
      (2L, "signup", 2000L), (2L, "purchase", 2100L),
      // u3: purchase only BEFORE signup — not converted
      (3L, "purchase", 500L), (3L, "signup", 3000L),
      // u4: signup, no purchase
      (4L, "signup", 4000L),
      // u5: purchase only, never signed up — absent from output
      (5L, "purchase", 9000L),
    )
    val got = run(rows)
    assert(got == Map(
      1L -> ((1000L, true, Some(40L))),
      2L -> ((2000L, true, Some(100L))),
      3L -> ((3000L, false, None)),
      4L -> ((4000L, false, None)),
    ))
  }

  test("hourlyBursts: RANGE baseline skips silent hours; first 24h never flag") {
    val hrNs = 3600000000000L
    // type A: steady 10/hour for hours 0..24, then a 31-event hour 25
    // (10*24=240 trailing, 31*24=744 > 720) and a 30-event hour 49 after a
    // 23-hour silence (baseline = ONLY hour 25's 31 events -> 30*24 > 93)
    val rows: Seq[(Long, String, Long)] =
      (for (h <- 0 to 24; i <- 0 until 10) yield (h.toLong, "A", h * hrNs + i)) ++
        (0 until 31).map(i => (25L, "A", 25L * hrNs + i)) ++
        (0 until 30).map(i => (49L, "A", 49L * hrNs + i))
    val df = rows.map { case (_, t, ts) => (t, ts, 0L) }.toDF("event_type", "ts", "event_id")
    val got = EventFunnel.hourlyBursts(df, epochNs = 0L, factor = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(10L) == ((10L, 100L, false)), "steady rate never flags")
    assert(got(0L)._3 == false && got(23L)._3 == false, "no full baseline yet")
    assert(got(25L) == ((31L, 240L, true)), "31*24 > 3*240")
    assert(got(49L) == ((30L, 31L, true)),
      "silent hours drop out of the RANGE baseline — only hour 25 remains")
  }

  test("mergeScdIntervals: folding ts-sliced compactions equals the one-shot compaction") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val events = (0 until 600).map { i =>
      (rnd.nextInt(12).toLong, Seq("a", "b", "c")(rnd.nextInt(3)), i.toLong * 100, i.toLong)
    }
    val df = events.toDF("user_id", "event_type", "ts", "event_id")
    val batch = graft.ext.EventFunnel.scdIntervals(df)
      .collect().map(_.toSeq).toSet
    for (cuts <- Seq(Seq(20000L), Seq(11100L, 30000L, 45000L))) {
      val bounds: Seq[Long] = (0L +: cuts) :+ Long.MaxValue
      val slices = bounds.sliding(2).collect { case Seq(lo, hi) =>
        df.where(org.apache.spark.sql.functions.col("ts") >= lo &&
          org.apache.spark.sql.functions.col("ts") < hi)
      }.toSeq
      val merged = slices.tail.foldLeft(
        graft.ext.EventFunnel.scdIntervals(slices.head)) { (acc, sl) =>
        graft.ext.EventFunnel.mergeScdIntervals(acc,
          graft.ext.EventFunnel.scdIntervals(sl))
      }
      assert(merged.collect().map(_.toSeq).toSet == batch, s"cuts $cuts")
    }
  }
}
