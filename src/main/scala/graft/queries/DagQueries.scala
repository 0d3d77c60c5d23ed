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

  /** Per-user changed-value emissions through HOURLY REPLAY CYCLES: the
    * engine's batching (hour buckets, last-per-user within a cycle, emit
    * only on change vs held state) must reproduce the SQL ground truth
    * (hourly-last + LAG != filter). Exercises ReplayDriver warp cycling,
    * virtual time (bucket = cycle timestamp), keyed state and the
    * update-suppression contract end-to-end. Cycle payloads are per-hour
    * deltas (small by construction) — the held state mirrors the
    * reference's in-memory node state. */
  private def dagChanges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.replay._
    import s.implicits._
    final case class Ev(ts: Long, eventId: Long, userId: Long, value: Double)
    val events = tbl(s, dir, "events")
      .select(col("ts"), col("event_id"), col("user_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => Ev(r._1, r._2, r._3, r._4))
    val HourNs = 3600L * 1000000000L
    val start = (events.map(_.ts).min / HourNs) * HourNs
    val end = ((events.map(_.ts).max + HourNs - 1) / HourNs) * HourNs

    val dag = new Dag
    val source = dag.sourceStream(List.empty[Ev], name = "events")
    val held = scala.collection.mutable.Map.empty[Long, Double]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val changes = dag.stream2(source, dag.now())(List.empty[(Long, Long, Double)]) {
      (batch, now) =>
        val lastPerUser = batch.groupBy(_.userId).view
          .mapValues(_.maxBy(e => (e.ts, e.eventId))).toMap
        val out = lastPerUser.toList.sortBy(_._1).flatMap { case (u, e) =>
          if (!held.get(u).contains(e.value)) {
            held(u) = e.value
            Some((u, now / 1000000000L, e.value))
          } else None
        }
        out
    }
    dag.state(changes) { cs: List[(Long, Long, Double)] => emitted ++= cs; emitted.size }
    dag.sink("changes", changes)

    val driver = ReplayDriver.create(
      dag,
      ReplayContext(start, end, HourNs),
      Map("events" -> (_ => new ListDataSource[Ev](events.toSeq, _.ts))),
      Map("changes" -> (_ => new graft.replay.ListDataSink[Any])))
    driver.run()

    emitted.toSeq.toDF("user_id", "bucket_end", "value")
      .orderBy(col("user_id"), col("bucket_end"))
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
    QueryDef(
      "q39_dag_changes",
      dagChanges,
      Some("""WITH hourly AS (
             |  SELECT user_id,
             |    ((epoch_ns(ts) - 1) // 3600000000000 + 1) * 3600 AS bucket_end, value,
             |    ROW_NUMBER() OVER (
             |      PARTITION BY user_id, ((epoch_ns(ts) - 1) // 3600000000000 + 1) * 3600
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events),
             |seq AS (
             |  SELECT user_id, bucket_end, value,
             |    LAG(value) OVER (PARTITION BY user_id ORDER BY bucket_end) AS prev
             |  FROM hourly WHERE rn = 1)
             |SELECT user_id, bucket_end, value FROM seq
             |WHERE prev IS NULL OR value != prev
             |ORDER BY user_id, bucket_end""".stripMargin),
    ),
  )
}
