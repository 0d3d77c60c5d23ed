package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Evaluation.passAtK]] — the unbiased Codex estimator in stepwise ppm
  * floor-division. Pins hand-computed exact cases, the guaranteed-hit
  * zero-factor path (n−c < k), the n ≥ max(k) filter, and full equality
  * with a JVM replica of the stepwise recurrence on random inputs. */
class PassAtKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)], ks: Seq[Int])
      : Map[Long, Seq[Long]] =
    Evaluation.passAtK(rows.toDF("task", "ok"), "task", col("ok"), ks)
      .collect()
      .map(r => r.getLong(0) -> (3 until 3 + ks.size).map(r.getLong).toSeq)
      .toMap
      .map { case (t, v) => t -> v }

  private def stepwise(n: Long, c: Long, k: Int): Long = {
    var ratio = 1000000L
    for (i <- 0 until k) ratio = ratio * (n - c - i) / (n - i)
    1000000L - ratio
  }

  test("hand-computed exact cases at n = 5") {
    val attempts = (ok: Seq[Boolean]) => ok.map(b => (1L, b))
    // c = 1: pass@1 = 1/5, pass@3 = 1 - C(4,3)/C(5,3) = 3/5, pass@5 = 1
    val out = run(attempts(Seq(true, false, false, false, false)), Seq(1, 3, 5))
    assert(out(1L) == Seq(200000L, 600000L, 1000000L))
    // c = 0: every pass@k = 0
    assert(run(attempts(Seq.fill(5)(false)), Seq(1, 3, 5))(1L) ==
      Seq(0L, 0L, 0L))
    // c = n: every pass@k = 10^6
    assert(run(attempts(Seq.fill(5)(true)), Seq(1, 3, 5))(1L) ==
      Seq(1000000L, 1000000L, 1000000L))
  }

  test("n - c < k: the zero factor guarantees pass@k = 10^6 exactly") {
    // n = 6, c = 4 -> n-c = 2 < 3: some 3-subset must contain a success
    val rows = Seq.fill(4)((9L, true)) ++ Seq.fill(2)((9L, false))
    assert(run(rows, Seq(3))(9L) == Seq(1000000L))
  }

  test("tasks with n < max(ks) are dropped") {
    val rows = Seq((1L, true), (1L, false), (1L, true),
      (2L, true), (2L, false), (2L, true), (2L, false), (2L, true))
    val out = run(rows, Seq(1, 5))
    assert(out.keySet == Set(2L))
  }

  test("random corpora equal the JVM stepwise replica") {
    val rnd = new scala.util.Random(83)
    val rows = (0L until 25L).flatMap { t =>
      Seq.fill(5 + rnd.nextInt(40))((t, rnd.nextInt(4) == 0))
    }
    val out = run(rows, Seq(1, 3, 5))
    val byTask = rows.groupBy(_._1)
    for ((t, got) <- out) {
      val n = byTask(t).size.toLong
      val c = byTask(t).count(_._2).toLong
      assert(got == Seq(stepwise(n, c, 1), stepwise(n, c, 3), stepwise(n, c, 5)),
        s"task $t (n=$n, c=$c)")
    }
    assert(out.keySet == byTask.keySet)
  }

  test("passAtKPpmJvm (the streaming twin's kernel) matches the Column form on a sweep") {
    for (n <- 1L to 40L; c <- 0L to n; k <- Seq(1, 3, 5) if n >= k)
      assert(Evaluation.passAtKPpmJvm(n, c, k) == stepwise(n, c, k),
        s"n=$n c=$c k=$k")
  }
}
