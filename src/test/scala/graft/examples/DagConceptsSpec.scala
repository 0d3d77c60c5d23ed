package graft.examples

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dag, SilentUpdate, StateUnchanged}

/** Executable walkthrough of the reference's dag concepts
  * (`/root/reference/examples/dag_concepts.py`,
  * `examples/advanced_concepts.py`) — examples ARE tests, matching the
  * reference's CI strategy (SURVEY.md §5). */
class DagConceptsSpec extends AnyFunSuite {

  test("map x2 chain (dag_concepts.py:39-47)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[Int], name = "in")
    val doubled = dag.stream(src)(List.empty[Int])(_.map(_ * 2))
    val quadrupled = dag.stream(doubled)(List.empty[Int])(_.map(_ * 2))
    src.setStream(List(1, 2, 3)); dag.execute()
    assert(quadrupled.getValue == List(4, 8, 12))
  }

  test("set node for distinct values (dag_concepts.py:58-63)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[String], name = "in")
    val unique = dag.stream(src)(Set.empty[String])(_.toSet)
    src.setStream(List("a", "b", "a")); dag.execute()
    assert(unique.getValue == Set("a", "b"))
    dag.execute()
    assert(unique.getValue == Set.empty[String]) // streams reset each cycle
  }

  test("accumulator state (dag_concepts.py:91-107)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[Int], name = "in")
    var total = 0
    val acc = dag.state(src) { xs: List[Int] => total += xs.sum; total }
    src.setStream(List(1, 2)); dag.execute()
    src.setStream(List(3)); dag.execute()
    dag.execute() // no input: state persists, not recomputed
    assert(acc.getValue == 6)
  }

  test("mutable function object inputs (AddOther, test_util.py:52-63)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[Int], name = "in")
    class AddOther(var other: Int) extends (List[Int] => List[Int]) {
      def apply(xs: List[Int]): List[Int] = xs.map(_ + other)
    }
    val addOther = new AddOther(10)
    val node = dag.stream(src)(List.empty[Int])(addOther)
    src.setStream(List(1)); dag.execute()
    assert(node.getValue == List(11))
    addOther.other = 100 // reconfigure the live function object
    src.setStream(List(1)); dag.execute()
    assert(node.getValue == List(101))
  }

  test("notify-any with two inputs (advanced_concepts.py:10-44)") {
    val dag = new Dag
    val left = dag.sourceStream(List.empty[Int], name = "l")
    val right = dag.sourceStream(List.empty[Int], name = "r")
    var runs = 0
    val both = dag.stream2(left, right)(List.empty[Int]) { (a, b) => runs += 1; a ++ b }
    dag.execute() // initial stain
    val base = runs
    left.setStream(List(1)); dag.execute() // only one input updated
    assert(runs == base + 1 && both.getValue == List(1))
    dag.execute() // nothing updated: no recompute
    assert(runs == base + 1)
  }

  test("GetMax + cutoff only propagates increases (advanced_concepts.py:142-198)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[Double], name = "in")
    var max = Double.MinValue
    val getMax = dag.state(src) { xs: List[Double] =>
      xs.foreach(x => max = math.max(max, x)); max
    }
    // cutoff with tolerance: ignore max moves smaller than 1.0
    val cut = dag.cutoff[Double](getMax, (a, b) => math.abs(a - b) < 1.0)
    var downstream = 0
    dag.state(cut) { v: Double => downstream += 1; v }
    dag.execute()
    val base = downstream
    src.setStream(List(10.0)); dag.execute()
    assert(downstream == base + 1)
    src.setStream(List(10.5)); dag.execute() // within tolerance: suppressed
    assert(downstream == base + 1)
    src.setStream(List(12.0)); dag.execute()
    assert(downstream == base + 2 && cut.getValue == 12.0)
  }

  test("stateAdv: explicit sentinels in user state functions") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[Int], name = "in")
    val n = dag.stateAdv[List[Int], Int](src) {
      case Nil => StateUnchanged
      case xs if xs.sum < 0 => SilentUpdate(xs.sum)
      case xs => xs.sum
    }
    src.setStream(List(5)); dag.execute()
    assert(n.getValue == 5 && n.getCycleId == dag.getCycleId)
    src.setStream(List(-7)); dag.execute()
    assert(n.getValue == -7 && n.getCycleId < dag.getCycleId) // silent
  }
}
