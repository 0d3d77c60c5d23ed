package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.{Dag, Node}
import graft.replay.SparkBatch

/** The perspective live-table RUNTIME, minus the web server: an
  * incrementally-maintained upserted table fed by dag cycles, with a
  * declarative view (sort / filters / limit) applied on read
  * (reference `beavers/perspective_wrapper.py:156-233`; the reference
  * delegates upsert-by-index to a perspective.Table — here the engine
  * maintains it as a keyed DataFrame, one `index`-keyed upsert per cycle).
  *
  * Delta from the reference: `remove_column` is declared and validated by
  * the reference (`perspective_wrapper.py:51,61-63`) but never wired into
  * its engine (the viewer consumes it); here it is implemented as engine
  * semantics — a delta row whose remove column is true deletes that index
  * from the maintained table.
  *
  * Scale shape: the upsert is a left-anti join + union keyed by the index
  * column (state is one row per live index), checkpointed per cycle so
  * lineage stays flat on a long-running live dashboard.
  */
final case class PerspectiveTableDefinition(
    name: String,
    indexColumn: String,
    removeColumn: Option[String] = None,
    // Within-delta tiebreak for duplicate indices (DataFrames have no row
    // order): lexicographic max wins. Empty = deltas carry unique indices.
    orderWithin: Seq[String] = Nil,
    view: TableOps.ViewSpec = TableOps.ViewSpec(),
    hiddenColumns: Seq[String] = Nil,
) {
  /** Fail-fast schema validation (reference
    * `PerspectiveTableDefinition.validate`, `perspective_wrapper.py:59-77`). */
  def validate(schema: StructType): Unit = {
    def has(c: String, what: String): Unit =
      require(schema.fieldNames.contains(c), s"$what column '$c' not in schema ${schema.fieldNames.mkString("[", ",", "]")}")
    has(indexColumn, "index")
    removeColumn.foreach(has(_, "remove"))
    orderWithin.foreach(has(_, "orderWithin"))
    hiddenColumns.foreach(has(_, "hidden"))
    view.sortBy.foreach { case (c, _) => has(c, "sort") }
  }
}

/** The maintained table + view for one perspective definition. */
final class PerspectiveTableSink(val definition: PerspectiveTableDefinition) {
  private var table: Option[DataFrame] = None

  /** Apply one cycle's delta: upsert by index (within-delta duplicates
    * resolved by `orderWithin`), then drop rows flagged by the remove
    * column. Returns the new maintained table. */
  def update(delta: DataFrame): DataFrame = {
    // every delta, not just the first: a malformed later delta should fail
    // with the definition's message, not an unresolved-column join error
    definition.validate(delta.schema)
    val deduped =
      if (definition.orderWithin.isEmpty) delta
      else TableOps.lastByKeys(delta, Seq(definition.indexColumn), definition.orderWithin)
    val upserted = table match {
      case None => deduped
      case Some(t) =>
        t.join(deduped.select(col(definition.indexColumn)),
            Seq(definition.indexColumn), "left_anti")
          .unionByName(deduped)
    }
    val next = definition.removeColumn match {
      case Some(rc) => upserted.where(!coalesce(col(rc).cast("boolean"), lit(false)))
      case None => upserted
    }
    table = Some(next.localCheckpoint(eager = true))
    table.get
  }

  /** The maintained (upserted) table; None before the first update. */
  def current: Option[DataFrame] = table

  /** The view the dashboard would render: hidden columns dropped, then the
    * declarative sort / filters / limit. */
  def view(): Option[DataFrame] = table.map { t =>
    TableOps.applyView(definition.hiddenColumns.foldLeft(t)(_.drop(_)), definition.view)
  }
}

object PerspectiveSink {

  /** Wire a SparkBatch stream node to a perspective table: a state node
    * applies each cycle's delta to the sink, and a named dag sink captures
    * the maintained table per cycle (reference `to_perspective`,
    * `perspective_wrapper.py:167-181`, state-node wiring `:178-181`). */
  def toPerspective(dag: Dag, node: Node[SparkBatch],
      definition: PerspectiveTableDefinition,
      schema: Option[StructType] = None): PerspectiveTableSink = {
    schema.foreach(definition.validate)
    val sink = new PerspectiveTableSink(definition)
    val state = dag.state(node) { b: SparkBatch => sink.update(b.df) }
    dag.sink(definition.name, state)
    sink
  }
}
