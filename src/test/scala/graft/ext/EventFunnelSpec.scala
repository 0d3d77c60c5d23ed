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
}
