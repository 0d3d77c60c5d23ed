package graft.testing

import graft.core.{Dag, Node}
import graft.core.Time.Nanos

/** Fluent end-to-end harness for dag tests
  * (reference `DagTestBench`, `beavers/testing.py:11-54`):
  * `setSource -> execute(now) -> assertSinkList / assertSinkNotUpdated`. */
final class DagTestBench(val dag: Dag) {
  dag.getSinks.foreach { case (name, sinks) =>
    require(sinks.size == 1, s"Sink $name must be unique in the bench")
  }

  def setSource[T](name: String, data: T): DagTestBench = {
    dag.getSources(name).asInstanceOf[Node[T]].setStream(data)
    this
  }

  def execute(): DagTestBench = { dag.execute(); this }
  def execute(now: Nanos): DagTestBench = { dag.execute(now); this }

  def assertSinkList[T](name: String, expected: Seq[T]): DagTestBench = {
    val sink = dag.getSinks(name).head
    assert(sink.getCycleId == dag.getCycleId, s"Sink $name was not updated this cycle")
    val actual = sink.getSinkValue.asInstanceOf[Iterable[T]].toSeq
    assert(actual.size == expected.size,
      s"Sink $name value size mismatch: got $actual, want $expected")
    actual.zip(expected).foreach { case (a, e) => assert(a == e, s"$a != $e in sink $name") }
    this
  }

  def assertSinkValue[T](name: String, expected: T): DagTestBench = {
    val sink = dag.getSinks(name).head
    assert(sink.getCycleId == dag.getCycleId, s"Sink $name was not updated this cycle")
    assert(sink.getSinkValue == expected,
      s"Sink $name: got ${sink.getSinkValue}, want $expected")
    this
  }

  def assertSinkNotUpdated(name: String): DagTestBench = {
    val sink = dag.getSinks(name).head
    assert(sink.getCycleId < dag.getCycleId, s"Sink $name got updated this cycle")
    this
  }
}
