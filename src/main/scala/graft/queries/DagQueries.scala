package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Dag
import graft.replay.SparkBatch
import graft.tables.TableOps
import QueryDef.tbl

/** Queries that run THROUGH the dataflow engine: data is split into
  * micro-batches, injected as dag cycles, accumulated in state nodes (as
  * DataFrames, so Spark does the heavy lifting per cycle), and the final
  * state is verified against a plain-SQL oracle over the same data. This
  * pins the engine's incremental semantics to the batch ground truth. */
object DagQueries {

  /** Incremental word count (the reference's flagship streaming example)
    * fed through dag cycles; final accumulated state must equal the global
    * batch word count. */
  private def dagWordCount(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val dag = new Dag
    val source = dag.sourceStream(SparkBatch(s.emptyDataFrame, 0), name = "docs")
    var countsDf: DataFrame = null
    val state = dag.state(source) { b: SparkBatch =>
      val batchCounts = b.df.select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      countsDf =
        if (countsDf == null) batchCounts
        else countsDf.unionByName(batchCounts)
          .groupBy("word").agg(sum("cnt").as("cnt"))
      // checkpoint the lineage so state doesn't grow a union chain per cycle
      countsDf = countsDf.localCheckpoint(eager = true)
      countsDf
    }
    dag.sink("counts", state)

    val batches = 5
    for (k <- 0 until batches) {
      source.setStream(SparkBatch(docs.where(pmod(col("doc_id"), lit(batches)) === k), 1))
      dag.execute()
    }
    state.getValue.select(col("word"), col("cnt").cast("long").as("cnt")).orderBy("word")
  }

  /** Last-by-key upsert state fed through dag cycles (W4 as an incremental
    * pipeline); final state must equal the batch latest-row-per-key. */
  private def dagLastBy(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val events = tbl(s, dir, "events")
    val dag = new Dag
    val source = dag.sourceStream(SparkBatch(s.emptyDataFrame, 0), name = "events")
    var stateDf: DataFrame = null
    val state = dag.state(source) { b: SparkBatch =>
      val all = if (stateDf == null) b.df else stateDf.unionByName(b.df)
      stateDf = TableOps.lastByKeys(all, Seq("user_id"), Seq("ts", "event_id"))
        .localCheckpoint(eager = true)
      stateDf
    }
    dag.sink("latest", state)

    val batches = 4
    for (k <- 0 until batches) {
      source.setStream(SparkBatch(events.where(pmod(col("event_id"), lit(batches)) === k), 1))
      dag.execute()
    }
    state.getValue
      .select(col("user_id"), col("event_id").as("last_event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q35_dag_wordcount",
      dagWordCount,
      Some("""SELECT word, COUNT(*) AS cnt FROM (
             |SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word ORDER BY word""".stripMargin),
    ),
    QueryDef(
      "q36_dag_lastby",
      dagLastBy,
      Some("""SELECT user_id, event_id AS last_event_id, event_type, value FROM (
             |SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
    ),
  )
}
