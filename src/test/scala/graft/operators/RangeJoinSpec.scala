package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed range-join semantics (q54's operator). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) = rows.toDF("pid", "k", "ts")
  private def ivs(rows: (Long, Long, Long, Long)*) = rows.toDF("iid", "k", "lo", "hi")

  private def pairs(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame, width: Long) =
    RangeJoin.rangeJoin(points, intervals, "k", "ts", "lo", "hi", width)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("inclusive bounds; overlapping intervals both match; keys isolate") {
    val got = pairs(
      pts((1L, 7L, 10L), (2L, 7L, 25L), (3L, 8L, 10L)),
      ivs((100L, 7L, 10L, 20L), (101L, 7L, 15L, 30L), (102L, 9L, 0L, 100L)),
      width = 8L)
    // point 1 at lo boundary of 100; point 2 inside 101 only; key 8/9 never meet
    assert(got == Set((1L, 100L), (2L, 101L)))
  }

  test("a pair meeting across several covered buckets appears exactly once") {
    // interval spans 5 buckets; point in the middle bucket
    val got = RangeJoin.rangeJoin(
      pts((1L, 7L, 50L)), ivs((100L, 7L, 10L, 90L)), "k", "ts", "lo", "hi", 20L)
      .collect()
    assert(got.length == 1)
  }

  test("property: agrees with the naive theta join on random data across bucket widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ptGen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L)))
    val ivGen = Gen.listOfN(10, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L),
      Gen.choose(0L, 30L)))
    (0 until 8).foreach { i =>
      Gen.zip(ptGen, ivGen).apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (ps, is) =>
          val points = pts(ps.zipWithIndex.map { case ((k, ts), j) => (j.toLong, k, ts) }: _*)
          val intervals = ivs(is.zipWithIndex.map { case ((k, lo, len), j) =>
            (100L + j, k, lo, lo + len) }: _*)
          val naive = points.as("p").join(intervals.as("i"),
              org.apache.spark.sql.functions.col("p.k") === org.apache.spark.sql.functions.col("i.k") &&
                org.apache.spark.sql.functions.col("p.ts")
                  .between(org.apache.spark.sql.functions.col("i.lo"),
                    org.apache.spark.sql.functions.col("i.hi")))
            .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          // widths smaller, equal, and larger than typical interval length
          Seq(1L, 7L, 64L).foreach { w =>
            assert(pairs(points, intervals, w) == naive, s"seed $i width $w")
          }
      }
    }
  }

  test("agrees with the naive theta join on the events table") {
    val hourNs = 3600L * 1000000000L
    val ev = graft.replay.TsNanos.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val windows = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (col("ts") - 24L * hourNs).as("lo"), col("ts").as("hi"))
    val fast = RangeJoin.rangeJoin(views, windows, "user_id", "ts", "lo", "hi", 6L * hourNs)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = views.as("v").join(windows.as("w"),
        col("v.user_id") === col("w.user_id") &&
          col("v.ts").between(col("w.lo"), col("w.hi")))
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }
}
