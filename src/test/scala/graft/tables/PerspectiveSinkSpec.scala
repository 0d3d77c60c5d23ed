package graft.tables

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Dag
import graft.replay.SparkBatch
import graft.tables.TableOps.{ViewFilter, ViewSpec}
import graft.testing.DagTestBench

/** Perspective runtime-sink semantics, mirroring
  * `/root/reference/tests/test_perpective_wrapper.py` (validation, upsert by
  * index, remove column) minus the web server. */
class PerspectiveSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // PERSPECTIVE_TABLE_SCHEMA fixture (test_perpective_wrapper.py:21-30),
  // with a value column so upserts are observable.
  private def defn = PerspectiveTableDefinition(
    name = "psp", indexColumn = "index", removeColumn = Some("remove"))

  test("definition validates index/remove/sort columns against the schema (test_config_validate)") {
    val schema = Seq(("a", false, 1)).toDF("index", "remove", "value").schema
    defn.validate(schema)
    val noIndex = intercept[IllegalArgumentException] {
      defn.validate(Seq((1, 2)).toDF("col1", "col2").schema)
    }
    assert(noIndex.getMessage.contains("index"))
    val noRemove = intercept[IllegalArgumentException] {
      defn.validate(Seq("x").toDF("index").schema)
    }
    assert(noRemove.getMessage.contains("remove"))
    val badSort = intercept[IllegalArgumentException] {
      defn.copy(view = ViewSpec(sortBy = Seq(("nope", true)))).validate(schema)
    }
    assert(badSort.getMessage.contains("nope"))
  }

  test("updates upsert by index; flagged rows are removed; view applies sort/filter/limit") {
    val sink = new PerspectiveTableSink(defn)

    sink.update(Seq(("a", false, 1), ("b", false, 2)).toDF("index", "remove", "value"))
    assert(sink.current.get.orderBy("index").collect().toSeq ==
      Seq(Row("a", false, 1), Row("b", false, 2)))

    // same index => the row is replaced, not appended
    sink.update(Seq(("a", false, 10), ("c", false, 3)).toDF("index", "remove", "value"))
    assert(sink.current.get.orderBy("index").collect().toSeq ==
      Seq(Row("a", false, 10), Row("b", false, 2), Row("c", false, 3)))

    // remove flag deletes the index from the maintained table
    sink.update(Seq(("b", true, 0)).toDF("index", "remove", "value"))
    assert(sink.current.get.orderBy("index").collect().toSeq ==
      Seq(Row("a", false, 10), Row("c", false, 3)))

    // a removed index can be re-inserted later
    sink.update(Seq(("b", false, 7)).toDF("index", "remove", "value"))
    assert(sink.current.get.orderBy("index").collect().toSeq ==
      Seq(Row("a", false, 10), Row("b", false, 7), Row("c", false, 3)))

    val viewed = new PerspectiveTableSink(defn.copy(
      view = ViewSpec(sortBy = Seq(("value", false)),
        viewFilters = Seq(ViewFilter.Gt("value", 1)), limit = Some(2)),
      hiddenColumns = Seq("remove")))
    viewed.update(Seq(("a", false, 1), ("b", false, 5), ("c", false, 3), ("d", false, 4))
      .toDF("index", "remove", "value"))
    assert(viewed.view().get.collect().toSeq == Seq(Row("b", 5), Row("d", 4)))
  }

  test("within-delta duplicate indices resolve by orderWithin (last wins)") {
    val sink = new PerspectiveTableSink(defn.copy(orderWithin = Seq("seq")))
    sink.update(Seq(("a", false, 1, 1L), ("a", false, 9, 2L))
      .toDF("index", "remove", "value", "seq"))
    assert(sink.current.get.collect().toSeq == Seq(Row("a", false, 9, 2L)))
  }

  test("dag wiring: per-cycle deltas maintain the table; empty cycle leaves the sink silent (test_add_node)") {
    val dag = new Dag
    val source = dag.sourceStream(SparkBatch(spark.emptyDataFrame, 0), name = "updates")
    val sink = PerspectiveSink.toPerspective(dag, source, defn)
    val bench = new DagTestBench(dag)

    bench
      .setSource("updates",
        SparkBatch(Seq(("a", false, 1), ("b", false, 2)).toDF("index", "remove", "value"), 2))
      .execute()
    assert(sink.current.get.orderBy("index").collect().toSeq ==
      Seq(Row("a", false, 1), Row("b", false, 2)))

    bench
      .setSource("updates",
        SparkBatch(Seq(("a", false, 5), ("b", true, 0)).toDF("index", "remove", "value"), 2))
      .execute()
    assert(sink.current.get.collect().toSeq == Seq(Row("a", false, 5)))

    // no delta injected: the source is empty, the state node must not run
    val before = dag.getSinks("psp").head.getCycleId
    bench.execute().assertSinkNotUpdated("psp")
    assert(dag.getSinks("psp").head.getCycleId == before)
  }
}
