package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based propagation invariants (SURVEY.md §5): notify-any,
  * empty-stream silence, diamond-once evaluation, cycle-id consistency —
  * over random injection schedules. (Direct Gen sampling: the
  * scalatest/scalacheck bridge isn't in the offline dependency set.) */
class DagPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], runs: Int = 60)(f: A => Unit): Unit =
    (0 until runs).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // per cycle: optional payloads for sources A and B
  val scheduleGen: Gen[List[(Option[List[Int]], Option[List[Int]])]] =
    Gen.listOfN(12, Gen.zip(
      Gen.option(Gen.listOf(Gen.choose(-5, 5))),
      Gen.option(Gen.listOf(Gen.choose(-5, 5)))))

  test("notify-any: a node recomputes exactly once per cycle with >=1 updated input") {
    forAll(scheduleGen) { schedule =>
      val dag = new Dag
      val a = dag.sourceStream(List.empty[Int], name = "a")
      val b = dag.sourceStream(List.empty[Int], name = "b")
      var calls = 0
      val merged = dag.stream2(a, b)(List.empty[Int]) { (x, y) => calls += 1; x ++ y }
      dag.execute() // settle initial stains
      val base = calls
      var expected = 0
      schedule.foreach { case (pa, pb) =>
        pa.foreach(a.setStream)
        pb.foreach(b.setStream)
        // an injected empty list still stains the source node (set_stream
        // semantics) even though the source won't update
        val anyUpdate = pa.exists(_.nonEmpty) || pb.exists(_.nonEmpty)
        if (anyUpdate) expected += 1
        val before = calls
        dag.execute()
        val ran = calls - before
        assert(ran <= 1, "at most one evaluation per cycle")
        if (anyUpdate) assert(ran == 1, "must recompute when an input updated")
        // merged value mirrors exactly this cycle's updates (stream reset)
        val want = pa.getOrElse(Nil) ++ pb.getOrElse(Nil)
        if (anyUpdate) assert(merged.getValue == want)
        else assert(merged.getValue == Nil)
        // cycle-id marks update iff non-empty output
        assert((merged.getCycleId == dag.getCycleId) == want.nonEmpty)
      }
      assert(calls - base >= expected)
    }
  }

  test("diamond inputs: shared input evaluated once, values consistent") {
    forAll(Gen.listOfN(8, Gen.listOf(Gen.choose(0, 9)))) { batches =>
      val dag = new Dag
      val src = dag.sourceStream(List.empty[Int], name = "src")
      val left = dag.stream(src)(List.empty[Int])(xs => xs.map(_ * 2))
      val right = dag.stream(src)(List.empty[Int])(xs => xs.map(_ * 3))
      var evals = 0
      val joined = dag.stream2(left, right)(List.empty[(Int, Int)]) { (l, r) =>
        evals += 1; l.zip(r)
      }
      dag.execute()
      batches.foreach { xs =>
        src.setStream(xs)
        val before = evals
        dag.execute()
        assert(evals - before <= 1)
        if (xs.nonEmpty)
          assert(joined.getValue == xs.map(_ * 2).zip(xs.map(_ * 3)))
      }
    }
  }

  test("state accumulations equal the batch ground truth under any batching") {
    forAll(Gen.listOf(Gen.listOf(Gen.choose(0, 20)))) { batches =>
      val dag = new Dag
      val src = dag.sourceStream(List.empty[Int], name = "src")
      var sum = 0L
      val total = dag.state(src) { xs: List[Int] => sum += xs.sum; sum }
      batches.foreach { xs => src.setStream(xs); dag.execute() }
      dag.execute()
      assert(total.getValue == batches.flatten.map(_.toLong).sum)
    }
  }

  test("cutoff only propagates on change; silence never notifies") {
    forAll(Gen.listOfN(10, Gen.choose(0, 2))) { values =>
      val dag = new Dag
      val src = dag.sourceStream(List.empty[Int], name = "src")
      val latest = dag.state(src) {
        var v = -1
        xs: List[Int] => { if (xs.nonEmpty) v = xs.last; v }
      }
      val cut = dag.cutoff(latest)
      var cutNotified = 0
      dag.state(cut) { v: Int => cutNotified += 1; v }
      val silent = dag.silence(latest)
      var silentNotified = 0
      dag.state(silent) { v: Int => silentNotified += 1; v }
      dag.execute()
      val (cutBase, silentBase) = (cutNotified, silentNotified)
      var distinctRuns = 0
      var prev = Option.empty[Int]
      values.foreach { v =>
        src.setStream(List(v))
        dag.execute()
        if (!prev.contains(v)) { distinctRuns += 1; prev = Some(v) }
        assert(silent.getValue == v) // value flows through silence
      }
      assert(cutNotified - cutBase == distinctRuns)
      assert(silentNotified == silentBase) // silence never notifies downstream
    }
  }
}
