package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Evaluation.bradleyTerry]] — MM fixed-point ratings in integer ppm.
  * Pins exact equality with a JVM replica of the floor-per-term rounds,
  * the strength ordering on transitive schedules, symmetric-cycle
  * equality, winless collapse to 0, and the confound BT exists for: a
  * player padding its win-rate against weak opponents rates below one
  * with a worse raw rate against strong ones. */
class BradleyTerrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(matches: Seq[(String, String)], iters: Int)
      : Map[String, (Long, Long, Long)] =
    Evaluation.bradleyTerry(matches.toDF("winner", "loser"), iters)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Driver replica: identical pair counts, floors, and round structure. */
  private def replica(matches: Seq[(String, String)], iters: Int)
      : Map[String, (Long, Long, Long)] = {
    val npq = (matches.map(m => (m._1, m._2)) ++ matches.map(m => (m._2, m._1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wins = matches.groupBy(_._1).map { case (p, v) => p -> v.size.toLong }
    val players = npq.keys.map(_._1).toSeq.distinct
    var r = players.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      r = players.map { p =>
        val denom = npq.collect { case ((`p`, q), n) =>
          n * 1000000000000L / math.max(r(p) + r(q), 1L)
        }.sum
        p -> wins.getOrElse(p, 0L) * 1000000000000L / math.max(denom, 1L)
      }.toMap
    }
    players.map { p =>
      val games = npq.collect { case ((`p`, _), n) => n }.sum
      p -> ((games, wins.getOrElse(p, 0L), r(p)))
    }.toMap
  }

  test("random schedules equal the JVM replica bit-for-bit") {
    val rnd = new scala.util.Random(97)
    val players = (0 until 8).map(i => s"s$i")
    val matches = Seq.fill(120) {
      val a = players(rnd.nextInt(players.size))
      var b = players(rnd.nextInt(players.size))
      while (b == a) b = players(rnd.nextInt(players.size))
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }
    assert(run(matches, 4) == replica(matches, 4))
  }

  test("transitive schedule orders strength; winless players rate 0") {
    val matches = Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "c"))
    val out = run(matches, 4)
    assert(out("a")._3 > out("b")._3 && out("b")._3 > out("c")._3)
    assert(out("c")._3 == 0L, "winless player collapses to 0")
    assert(out("a") == ((5L, 5L, out("a")._3)) && out("b")._1 == 10L)
  }

  test("denom guard: unguarded div-by-zero is non-deterministic cross-config; the guard is total") {
    // Ratings can at most double per MM round (r_p' <= r_p + max_q r_q),
    // so after t rounds max rating <= 2^t * 1e6; near the iters = 20 cap
    // rp + rq can brush n_pq * 1e12 and floor EVERY pair-term of a
    // player to 0 -> denom = 0. Unguarded, that divides by zero —
    // NULL under non-ANSI Spark, an error under ANSI Spark (this
    // session's default) and DuckDB: three behaviors for one formula.
    // The guard makes it total and deterministic everywhere: w * 1e12
    // (the "unbounded strength" limit), identity whenever denom >= 1.
    val row = Seq((3L, 0L)).toDF("w", "denom")
    intercept[Exception] {
      row.selectExpr("(w * 1000000000000L) div denom").collect()
    }
    assert(row.selectExpr("(w * 1000000000000L) div greatest(denom, 1L)")
      .collect()(0).getLong(0) == 3000000000000L)
    val ok = Seq((3L, 5L)).toDF("w", "denom")
    assert(ok.selectExpr("(w * 1000000000000L) div greatest(denom, 1L)")
      .collect()(0).getLong(0) == 600000000000L)
  }

  test("a symmetric cycle rates everyone equally") {
    val matches = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val out = run(matches, 4)
    assert(out("a")._3 == out("b")._3 && out("b")._3 == out("c")._3)
  }

  test("win-rate confounding: 75% against a weak opponent rates below 50% against a strong one") {
    // 'pad' goes 3-1 against 'weak' (75% raw); 'hon' goes 2-2 against
    // 'top' (50% raw), where top crushes 'f' and f beats weak — the
    // schedule context BT exists to discount (verified numerically:
    // hon ≈ 2.14e6, pad ≈ 0.75e6)
    val matches =
      Seq.fill(3)(("pad", "weak")) ++ Seq(("weak", "pad")) ++
        Seq(("hon", "top"), ("hon", "top"), ("top", "hon"), ("top", "hon")) ++
        Seq.fill(6)(("top", "f")) ++ Seq.fill(2)(("f", "weak"))
    val out = run(matches, 6)
    assert(out("hon")._3 > out("pad")._3,
      s"BT must discount padded schedules: ${out("hon")._3} vs ${out("pad")._3}")
    assert(out("top")._3 > out("hon")._3 && out("pad")._3 > out("weak")._3)
  }
}
