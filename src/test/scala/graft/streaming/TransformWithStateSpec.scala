package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.TransformWithStateOps.{KeyedEvent, SessionResult}

/** transformWithState (Spark 4): keyed state + event-time timers — the
  * TimerManager pattern as a continuous query. */
class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("inactivity sessions fire on event-time timers (E3+E7 via transformWithState)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Timestamp)]
      val events = input.toDF().toDF("key", "ts")
        .withWatermark("ts", "0 seconds")
        .select(col("key"), (unix_millis(col("ts"))).as("eventTimeMs"))
        .as[KeyedEvent]
      val sessions = TransformWithStateOps.inactivitySessions(events, gapMs = 5000L)
      val query = sessions.writeStream.format("memory").queryName("sessions")
        .outputMode("update").start()
      try {
        def t(ms: Long) = new Timestamp(ms)
        input.addData(("a", t(1000)), ("a", t(2000)))
        query.processAllAvailable()
        assert(spark.table("sessions").isEmpty) // timer armed at 7000, wm=2000

        input.addData(("b", t(20000))) // advances watermark past a's timer
        query.processAllAvailable()
        input.addData(("c", t(40000))) // one more batch so wm=20000 applies
        query.processAllAvailable()

        val out = spark.table("sessions").as[SessionResult].collect().toSet
        assert(out.contains(SessionResult("a", 2L, 2000L)))
        assert(!out.exists(_.key == "c")) // c's timer not yet expired
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
