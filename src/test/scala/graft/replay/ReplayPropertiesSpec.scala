package graft.replay

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Dag
import graft.core.Time.Nanos

/** Property-based replay invariants over random event timelines: every
  * record delivered exactly once, in order, regardless of frequency; warp
  * never skips data; the accumulated state equals the batch ground truth. */
class ReplayPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], runs: Int = 40)(f: A => Unit): Unit =
    (0 until runs).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  val HourNs: Nanos = 3600L * 1000000000L

  case class Ev(ts: Nanos, v: Int)
  val eventsGen: Gen[(List[Ev], Nanos)] = for {
    n <- Gen.choose(0, 40)
    // timestamps over a ~3 day window with big gaps (exercises warp)
    ts <- Gen.listOfN(n, Gen.choose(1L, 72L * HourNs))
    freqHours <- Gen.choose(1, 12)
  } yield (ts.zipWithIndex.map { case (t, i) => Ev(t, i) }, freqHours * HourNs)

  test("every record replays exactly once, in timestamp order, any frequency") {
    forAll(eventsGen) { case (events, freq) =>
      val dag = new Dag
      val src = dag.sourceStream(List.empty[Ev], name = "ev")
      var seen = List.empty[Ev]
      var cycles = 0
      dag.state(src) { xs: List[Ev] => seen ++= xs; cycles += 1; seen.size }
      val sinkNode = dag.sink("out", src)
      val driver = ReplayDriver.create(
        dag,
        ReplayContext(0L, 80L * HourNs, freq),
        Map("ev" -> (_ => new ListDataSource[Ev](events, _.ts))),
        Map("out" -> (_ => new ListDataSink[Any])))
      driver.run()
      // exactly once, globally sorted by (ts, insertion)
      assert(seen.map(_.v).sorted == events.map(_.v).sorted)
      assert(seen.map(_.ts) == seen.map(_.ts).sorted)
      // warp efficiency: never more data cycles than events
      assert(cycles <= math.max(1, events.size + 1))
      assert(sinkNode != null)
    }
  }

  test("cycle timestamps are aligned, monotonic, and cover each record") {
    forAll(eventsGen) { case (events, freq) =>
      val dag = new Dag
      val src = dag.sourceStream(List.empty[Ev], name = "ev")
      var stamps = List.empty[(Nanos, List[Ev])]
      val paired = dag.stream2(src, dag.now())(List.empty[Ev]) { (xs, now) =>
        if (xs.nonEmpty) stamps ::= (now, xs)
        xs
      }
      dag.sink("out", paired)
      val end = 80L * HourNs
      val driver = ReplayDriver.create(
        dag, ReplayContext(0L, end, freq),
        Map("ev" -> (_ => new ListDataSource[Ev](events, _.ts))),
        Map("out" -> (_ => new ListDataSink[Any])))
      driver.run()
      val ordered = stamps.reverse
      // monotonic cycle times, aligned to the frequency (except a final
      // end-clamped cycle), and each record's ts <= its cycle time
      assert(ordered.map(_._1) == ordered.map(_._1).sorted)
      ordered.foreach { case (now, xs) =>
        assert(now % freq == 0 || now == end)
        xs.foreach(e => assert(e.ts <= now && e.ts > now - freq - 1))
      }
    }
  }
}
