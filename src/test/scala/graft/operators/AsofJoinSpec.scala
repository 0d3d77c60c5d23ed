package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AS-OF join semantics (q53's operator). */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(trades: Seq[(Long, Long, Long, Double)],
      quotes: Seq[(Long, Long, Long, Double)]): Map[Long, (Option[Long], Option[Double])] = {
    import spark.implicits._
    val t = trades.toDF("event_id", "k", "ts", "value")
    val q = quotes.toDF("event_id", "k", "ts", "value")
    AsofJoin.asofJoin(t, q, "k", "ts", "value", "event_id")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toMap
  }

  test("picks the latest quote at-or-before each trade; inclusive at equal ts") {
    val out = run(
      trades = Seq((1L, 7L, 100L, 1.0), (2L, 7L, 205L, 1.0), (3L, 7L, 300L, 1.0)),
      quotes = Seq((10L, 7L, 100L, 5.0), (11L, 7L, 200L, 6.0), (12L, 7L, 301L, 7.0)))
    assert(out(1L) == (Some(100L), Some(5.0))) // equal ts matches (inclusive)
    assert(out(2L) == (Some(200L), Some(6.0)))
    assert(out(3L) == (Some(200L), Some(6.0))) // 301 is in the future
  }

  test("no prior quote -> null columns; keys never cross") {
    val out = run(
      trades = Seq((1L, 7L, 50L, 1.0), (2L, 8L, 500L, 1.0)),
      quotes = Seq((10L, 7L, 100L, 5.0)))
    assert(out(1L) == (None, None))  // quote is later
    assert(out(2L) == (None, None))  // quote is for another key
  }

  test("a matched right row with NULL value yields (its ts, NULL), not an older value") {
    import spark.implicits._
    // quote at ts=200 has a NULL value; the trade at 205 must see
    // (200, NULL) — the matched row's NULL — not (200, 5.0) stitched from
    // two different rows (DuckDB ASOF JOIN returns the matched row's NULL)
    val trades = Seq((1L, 7L, 205L, 1.0)).toDF("event_id", "k", "ts", "value")
    val quotes = Seq((10L, 7L, 100L, Some(5.0)), (11L, 7L, 200L, Option.empty[Double]))
      .toDF("event_id", "k", "ts", "value")
    val r = AsofJoin.asofJoin(trades, quotes, "k", "ts", "value", "event_id").collect()
    assert(r.length == 1)
    assert(r(0).getLong(4) == 200L)   // asof_ts from the matched row
    assert(r(0).isNullAt(5))          // asof_value is that row's NULL
  }

  test("left inputs colliding with operator-internal column names are rejected at build time") {
    import spark.implicits._
    val t = Seq((1L, 7L, 205L, 1.0)).toDF("event_id", "k", "ts", "side")
    val q = Seq((10L, 7L, 100L, 5.0)).toDF("event_id", "k", "ts", "value")
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(t, q, "k", "ts", "value", "event_id")
    }
    assert(err.getMessage.contains("side"))
  }

  test("duplicate (key, ts) quotes resolve to the highest tiebreaker") {
    val out = run(
      trades = Seq((1L, 7L, 100L, 1.0)),
      quotes = Seq((10L, 7L, 100L, 5.0), (11L, 7L, 100L, 9.0)))
    assert(out(1L) == (Some(100L), Some(9.0)))
  }

  test("forward: picks the earliest quote at-or-after; inclusive at equal ts; no future -> null") {
    import spark.implicits._
    val t = Seq((1L, 7L, 100L, 1.0), (2L, 7L, 205L, 1.0), (3L, 7L, 400L, 1.0))
      .toDF("event_id", "k", "ts", "value")
    val q = Seq((10L, 7L, 100L, 5.0), (11L, 7L, 200L, 6.0), (12L, 7L, 301L, 7.0))
      .toDF("event_id", "k", "ts", "value")
    val out = AsofJoin.asofJoinForward(t, q, "k", "ts", "value", "event_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) == ((Some(100L), Some(5.0)))) // equal ts matches (inclusive)
    assert(out(2L) == ((Some(301L), Some(7.0))))
    assert(out(3L) == ((None, None))) // nothing in the future
  }

  test("forward property: agrees with the naive min-future formulation on adversarial data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rowGen = Gen.listOfN(18, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L),
      Gen.choose(0, 99).map(_.toDouble)))
    (0 until 10).foreach { i =>
      Gen.zip(rowGen, rowGen).apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (ts0, qs0) =>
          val trades = ts0.zipWithIndex.map { case ((k, ts, v), j) => (j.toLong, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val quotes = qs0.zipWithIndex.map { case ((k, ts, v), j) => (100L + j, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val fast = AsofJoin.asofJoinForward(trades, quotes, "k", "ts", "value", "event_id")
            .select(col("event_id"), col("asof_value")).collect()
            .map(r => r.getLong(0) -> Option(r.get(1))).toMap
          // naive: min future ts, then the max-event_id quote at that ts
          val naive = trades.as("t")
            .join(quotes.as("q"),
              col("t.k") === col("q.k") && col("q.ts") >= col("t.ts"), "left")
            .groupBy(col("t.event_id").as("event_id"))
            .agg(max_by(col("q.value"),
              struct((-col("q.ts")).as("nt"), col("q.event_id"))).as("nv"))
            .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
          assert(fast == naive, s"seed $i")
      }
    }
  }

  test("property: agrees with the naive formulation on adversarial random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // tiny key/ts domains force equal-ts ties, duplicate quotes, empty keys
    val rowGen = Gen.listOfN(18, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L),
      Gen.choose(0, 99).map(_.toDouble)))
    (0 until 10).foreach { i =>
      Gen.zip(rowGen, rowGen).apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (ts0, qs0) =>
          val trades = ts0.zipWithIndex.map { case ((k, ts, v), j) => (j.toLong, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val quotes = qs0.zipWithIndex.map { case ((k, ts, v), j) => (100L + j, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val fast = AsofJoin.asofJoin(trades, quotes, "k", "ts", "value", "event_id")
            .select(col("event_id"), col("asof_value")).collect()
            .map(r => r.getLong(0) -> Option(r.get(1))).toMap
          val naive = trades.as("t")
            .join(quotes.as("q"),
              col("t.k") === col("q.k") && col("q.ts") <= col("t.ts"), "left")
            .groupBy(col("t.event_id").as("event_id"))
            .agg(max_by(col("q.value"), struct(col("q.ts"), col("q.event_id"))).as("nv"))
            .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
          assert(fast == naive, s"seed $i")
      }
    }
  }

  test("nearest: hand semantics — closest wins, backward breaks ties, tolerance nulls") {
    import spark.implicits._
    val trades = Seq((1L, 1L, 10L, 0.0), (2L, 1L, 14L, 0.0), (3L, 1L, 100L, 0.0))
      .toDF("event_id", "k", "ts", "value")
    val quotes = Seq((101L, 1L, 8L, 8.0), (102L, 1L, 12L, 12.0), (103L, 1L, 16L, 16.0))
      .toDF("event_id", "k", "ts", "value")
    val got = AsofJoin.asofJoinNearest(trades, quotes, "k", "ts", "value",
        "event_id", toleranceNs = 10L)
      .collect().map(r => r.getLong(0) -> Option(r.get(5))).toMap
    assert(got(1L).contains(8.0))  // dist 2 both ways -> backward wins
    assert(got(2L).contains(12.0)) // 12 at dist 2 beats 16 at dist 2? no: dist(14,12)=2 dist(14,16)=2 -> backward
    assert(got(3L).isEmpty)        // nearest (16) at dist 84 > tolerance 10
  }

  test("nearest property: agrees with the naive closest-within-tolerance formulation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rowGen = Gen.listOfN(18, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L),
      Gen.choose(0, 99).map(_.toDouble)))
    (0 until 10).foreach { i =>
      Gen.zip(rowGen, rowGen).apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (ts0, qs0) =>
          val trades = ts0.zipWithIndex.map { case ((k, ts, v), j) => (j.toLong, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val quotes = qs0.zipWithIndex.map { case ((k, ts, v), j) => (100L + j, k, ts, v) }
            .toDF("event_id", "k", "ts", "value")
          val tol = 3L
          val fast = AsofJoin.asofJoinNearest(trades, quotes, "k", "ts", "value",
              "event_id", toleranceNs = tol)
            .select(col("event_id"), col("asof_value")).collect()
            .map(r => r.getLong(0) -> Option(r.get(1))).toMap
          // naive: dedup (k, ts) by max event_id, then per trade the
          // closest within tolerance, backward winning distance ties
          val dq = quotes.groupBy(col("k"), col("ts").as("r_ts"))
            .agg(max_by(col("value"), col("event_id")).as("r_val"))
          val naive = trades.as("t")
            .join(dq.as("q"), col("t.k") === col("q.k") &&
              abs(col("q.r_ts") - col("t.ts")) <= tol, "left")
            .groupBy(col("t.event_id").as("event_id"))
            .agg(max_by(col("q.r_val"),
              struct((-abs(col("q.r_ts") - col("t.ts"))).as("nd"),
                when(col("q.r_ts") <= col("t.ts"), 1).otherwise(0).as("bk")))
              .as("nv"))
            .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
          assert(fast == naive, s"seed $i")
      }
    }
  }

  test("agrees with the naive O(T*Q) formulation on the events table") {
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val trades = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val quotes = ev.where(col("event_type") === "view")
    val fast = AsofJoin.asofJoin(trades, quotes, "user_id", "ts", "value", "event_id")
      .select(col("event_id"), col("asof_value"))
    val naive = trades.as("t")
      .join(quotes.as("q"),
        col("t.user_id") === col("q.user_id") && col("q.ts") <= col("t.ts"), "left")
      .groupBy(col("t.event_id").as("event_id"))
      .agg(max_by(col("q.value"), struct(col("q.ts"), col("q.event_id"))).as("naive_value"))
    val diff = fast.join(naive, Seq("event_id"))
      .where(!(col("asof_value") <=> col("naive_value")))
    assert(diff.count() == 0)
    assert(fast.count() == trades.count())
  }
}
