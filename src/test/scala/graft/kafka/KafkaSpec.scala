package graft.kafka

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dag, Time}
import graft.core.Time.Nanos

/** Mock-driven Kafka-layer tests mirroring `/root/reference/tests/test_kafka.py`:
  * offset-policy resolution, start-of-day math, cross-topic time-aligned
  * priming with backpressure, and the word-count end-to-end driver. */
class KafkaSpec extends AnyFunSuite {

  def ts(s: String): Nanos = Time.parse(s)
  def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  // Shared in-memory clients (see MockClients; contract coverage for any
  // client implementation lives in ClientContractSpec).
  type MockConsumer = MockClients.MockConsumer
  type MockProducer = MockClients.MockProducer
  def MockConsumer(topicsData: Map[String, Seq[Seq[(Nanos, String)]]]): MockConsumer =
    new MockClients.MockConsumer(topicsData)

  val noopDeser: MessageDeserializer[List[String]] =
    (ms: Seq[KMessage]) => ms.map(m => new String(m.value, "UTF-8")).toList

  test("offset resolution per policy (kafka.py:601-652)") {
    val data = Map("topic" -> Seq(Seq(
      (ts("2023-01-01T01:00:00Z"), "a"),
      (ts("2023-01-01T02:00:00Z"), "b"),
      (ts("2023-01-01T03:00:00Z"), "c"))))
    val consumer = new MockConsumer(data)
    val tp = TopicPartition("topic", 0)
    val now = ts("2023-01-01T04:00:00Z")
    def resolve(p: OffsetPolicy) =
      OffsetResolver.resolveTopic(consumer, SourceTopic("topic", noopDeser, p), now)(tp)

    assert(resolve(OffsetPolicy.Latest) == ((3L, 2L)))
    assert(resolve(OffsetPolicy.Earliest) == ((0L, 2L)))
    assert(resolve(OffsetPolicy.AbsoluteTime(ts("2023-01-01T02:00:00Z"))) == ((1L, 2L)))
    // past end: start at log end, already live ((end, end-1) convention —
    // the reference's (end, end) depended on its current_offset=start
    // off-by-one, see PartitionInfo)
    assert(resolve(OffsetPolicy.AbsoluteTime(ts("2023-01-01T09:00:00Z"))) == ((3L, 2L)))
    assert(resolve(OffsetPolicy.RelativeTime(2L * 3600L * 1000000000L)) == ((1L, 2L)))
    consumer.committedOffsets(tp) = 2L
    assert(resolve(OffsetPolicy.Committed) == ((2L, 2L)))
  }

  test("previous start-of-day across timezones (kafka.py:655-664)") {
    val sod = 9L * 3600L * 1000000000L // 09:00
    // 2023-06-15 16:00 UTC = 12:00 New York (EDT): past 09:00 local -> same day
    assert(OffsetResolver.previousStartOfDay(
      ts("2023-06-15T16:00:00Z"), sod, "America/New_York") == ts("2023-06-15T13:00:00Z"))
    // 2023-06-15 08:00 UTC = 04:00 New York: before 09:00 local -> previous day
    assert(OffsetResolver.previousStartOfDay(
      ts("2023-06-15T08:00:00Z"), sod, "America/New_York") == ts("2023-06-14T13:00:00Z"))
    // plain UTC
    assert(OffsetResolver.previousStartOfDay(
      ts("2023-06-15T10:00:00Z"), sod, "UTC") == ts("2023-06-15T09:00:00Z"))
  }

  test("priming releases cross-topic messages in global time order (kafka.py:298-341)") {
    // topic a: early messages; topic b: later messages; interleaved ordering
    val data = Map(
      "a" -> Seq(Seq((10L, "a1"), (30L, "a2"), (50L, "a3"))),
      "b" -> Seq(Seq((20L, "b1"), (40L, "b2"), (60L, "b3"))))
    val consumer = new MockConsumer(data)
    val topics = Seq(
      SourceTopic[List[String]]("a", noopDeser, OffsetPolicy.Earliest),
      SourceTopic[List[String]]("b", noopDeser, OffsetPolicy.Earliest))
    val manager = ConsumerManager.create(consumer, topics, batchSize = 2, nowNs = () => 1000L)
    val released = mutable.ArrayBuffer.empty[String]
    (1 to 10).foreach { _ =>
      released ++= manager.poll(0).map(m => new String(m.value, "UTF-8"))
    }
    // global event-time order despite round-robin consumption
    assert(released.toList == List("a1", "b1", "a2", "b2", "a3", "b3"))
    assert(manager.primingWatermark.isEmpty) // both partitions live at the end
  }

  test("untimestamped messages sort last and are held until live (kafka.py:683-686)") {
    // u1 has no broker timestamp (ts = 0 => TIMESTAMP_NOT_AVAILABLE): it must
    // be released AFTER every timestamped message, never first during priming.
    val data = Map(
      "a" -> Seq(Seq((0L, "u1"), (10L, "a1"), (30L, "a2"))),
      "b" -> Seq(Seq((20L, "b1"))))
    val consumer = new MockConsumer(data)
    val topics = Seq(
      SourceTopic[List[String]]("a", noopDeser, OffsetPolicy.Earliest),
      SourceTopic[List[String]]("b", noopDeser, OffsetPolicy.Earliest))
    val manager = ConsumerManager.create(consumer, topics, batchSize = 2, nowNs = () => 1000L)
    val released = mutable.ArrayBuffer.empty[String]
    (1 to 10).foreach { _ =>
      released ++= manager.poll(0).map(m => new String(m.value, "UTF-8"))
    }
    assert(released.toList == List("a1", "b1", "a2", "u1"))
  }

  test("backpressure pauses the partition running ahead (kafka.py:349-381)") {
    // topic b is far ahead in time and has many messages: with a tiny batch
    // size its partition must get paused while a catches up
    val aMsgs = (1 to 20).map(i => (i.toLong * 10L, s"a$i"))
    val bMsgs = (1 to 20).map(i => (1000000L + i.toLong, s"b$i"))
    val data = Map("a" -> Seq(aMsgs), "b" -> Seq(bMsgs))
    val consumer = new MockConsumer(data)
    val topics = Seq(
      SourceTopic[List[String]]("a", noopDeser, OffsetPolicy.Earliest),
      SourceTopic[List[String]]("b", noopDeser, OffsetPolicy.Earliest))
    val manager = ConsumerManager.create(consumer, topics, batchSize = 2, nowNs = () => 10000000L)
    var sawPause = false
    val released = mutable.ArrayBuffer.empty[String]
    (1 to 40).foreach { _ =>
      released ++= manager.poll(0).map(m => new String(m.value, "UTF-8"))
      sawPause ||= consumer.pausedSet.nonEmpty
    }
    assert(sawPause, "partition b should have been paused while a replayed")
    assert(consumer.pausedSet.isEmpty, "paused partitions resume once watermark catches up")
    // all a messages released before any b message (strict time alignment)
    val (aIdx, bIdx) = (released.zipWithIndex.filter(_._1.startsWith("a")).map(_._2),
      released.zipWithIndex.filter(_._1.startsWith("b")).map(_._2))
    assert(aIdx.nonEmpty && bIdx.nonEmpty && aIdx.max < bIdx.min)
  }

  test("priming tracks the watermark per partition within one topic") {
    // partition 0 is slow (old timestamps), partition 1 is far ahead
    val data = Map("t" -> Seq(
      (1 to 12).map(i => (i.toLong * 10L, s"p0-$i")),
      (1 to 12).map(i => (100000L + i, s"p1-$i"))))
    val consumer = new MockConsumer(data)
    val manager = ConsumerManager.create(
      consumer,
      Seq(SourceTopic[List[String]]("t", noopDeser, OffsetPolicy.Earliest)),
      batchSize = 2, nowNs = () => 10000000L)
    val released = mutable.ArrayBuffer.empty[String]
    (1 to 40).foreach(_ => released ++= manager.poll(0).map(m => new String(m.value, "UTF-8")))
    // all of p0 must be released before any of p1 (global event-time order
    // enforced across partitions of the same topic)
    val p0 = released.zipWithIndex.filter(_._1.startsWith("p0")).map(_._2)
    val p1 = released.zipWithIndex.filter(_._1.startsWith("p1")).map(_._2)
    assert(p0.size == 12 && p1.size == 12)
    assert(p0.max < p1.min)
  }

  test("word-count end-to-end through KafkaDriver (test_kafka.py:474-586)") {
    val dag = new Dag
    val messages = dag.sourceStream(List.empty[String], name = "words")
    val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    val state = dag.state(messages) { ws: List[String] =>
      ws.foreach(w => counts(w) += 1); counts.toMap
    }
    val touched = dag.stream(messages)(List.empty[String])(_.distinct.sorted)
    val records = dag.stream2(touched, state)(Map.empty[String, Long]) { (ks, all) =>
      ks.map(k => k -> all(k)).toMap
    }
    dag.sink("counts", records)

    val data = Map("words" -> Seq(Seq(
      (ts("2023-01-01T01:00:00Z"), "hello"),
      (ts("2023-01-01T01:01:00Z"), "world"),
      (ts("2023-01-01T01:02:00Z"), "hello"))))
    val consumer = new MockConsumer(data)
    val producer = new MockProducer
    val serializer: MessageSerializer[Map[String, Long]] =
      (m: Map[String, Long]) => m.toSeq.sortBy(_._1).map { case (w, c) =>
        ProducerMessage("counts_out", utf8(w), utf8(c.toString))
      }
    val driver = KafkaDriver.create(
      dag, consumer, producer,
      Map("words" -> ((SourceTopic.fromEarliest[List[String]]("words", noopDeser),
        ((v: Any) => v.asInstanceOf[List[String]].size): Any => Int))),
      Map("counts" -> serializer),
      batchSize = 2,
      nowNs = () => ts("2023-01-01T02:00:00Z"))

    var cycles = 0
    (1 to 5).foreach { _ => if (driver.runCycle(0)) cycles += 1 }
    assert(cycles >= 2) // batchSize=2 forces at least two data cycles
    assert(producer.produced.map(p => (p._1, p._2, p._3)).toList ==
      List(("counts_out", "hello", "1"), ("counts_out", "world", "1"),
        ("counts_out", "hello", "2")))
    val m = driver.flushProducerMetrics()
    assert(m.producedCount == 3 && m.confirmedCount == 3)
  }

  test("priming watermark exposed until live; metrics count held/released") {
    val data = Map("t" -> Seq((1 to 6).map(i => (i.toLong * 100L, s"m$i"))))
    val consumer = new MockConsumer(data)
    val manager = ConsumerManager.create(
      consumer, Seq(SourceTopic[List[String]]("t", noopDeser, OffsetPolicy.Earliest)),
      batchSize = 2, nowNs = () => 1000000L)
    val r1 = manager.poll(0)
    // all 6 consumed into the buffer, 2 released per cycle
    assert(r1.size == 2)
    val m1 = manager.flushMetrics()
    assert(m1.consumedMessageCount == 6 && m1.releasedMessageCount == 2 && m1.heldMessageCount == 4)
    // partition became live on consumption, so watermark is now wall-time
    assert(manager.primingWatermark.isEmpty)
    assert(manager.poll(0).size == 2 && manager.poll(0).size == 2)
    val m2 = manager.flushMetrics()
    assert(m2.releasedMessageCount == 4 && m2.heldMessageCount == 0 && m2.consumedMessageCount == 0)
  }

  test("error messages are counted and skipped by the driver") {
    val dag = new Dag
    dag.sourceStream(List.empty[String], name = "t")
    val tp = TopicPartition("t", 0)
    val consumer = new MockConsumer(Map("t" -> Seq(Seq((10L, "ok"))))) {
      private var sentError = false
      override def poll(timeoutMs: Long): Option[KMessage] = {
        if (!sentError) { sentError = true
          Some(KMessage(tp, -1L, 5L, null, Array.emptyByteArray, error = Some("boom")))
        } else super.poll(timeoutMs)
      }
    }
    val manager = ConsumerManager.create(
      consumer, Seq(SourceTopic[List[String]]("t", noopDeser, OffsetPolicy.Earliest)),
      batchSize = 10, nowNs = () => 1000L)
    manager.poll(0)
    assert(manager.flushMetrics().errorMessageCount == 1)
  }

  test("timers force a driver cycle with no messages (kafka.py:574-586)") {
    val dag = new Dag
    val src = dag.sourceStream(List.empty[String], name = "t")
    var fired = 0
    dag.stream3(src, dag.now(), dag.timerManager())(List.empty[Nanos]) {
      (entries, now, tm) =>
        if (entries.nonEmpty) tm.setNextTimer(now + 1000L)
        if (tm.justTriggered) { fired += 1; List(now) } else Nil
    }
    var clock = ts("2023-01-01T00:00:00Z")
    val consumer = new MockConsumer(Map("t" -> Seq(Seq((clock, "x")))))
    val driver = KafkaDriver.create(
      dag, consumer, new MockProducer,
      Map("t" -> ((SourceTopic.fromEarliest[List[String]]("t", noopDeser),
        ((v: Any) => v.asInstanceOf[List[String]].size): Any => Int))),
      Map.empty, batchSize = 10, nowNs = () => clock)

    assert(driver.runCycle(0)) // consumes "x", arms the timer
    clock += 500L
    assert(!driver.runCycle(0)) // no messages, timer not due: no cycle
    clock += 1000L
    assert(driver.runCycle(0)) // timer due: cycle runs WITHOUT messages
    assert(fired == 1)
  }

  test("spark kafka source options per policy") {
    val t = SourceTopic.fromEarliest[List[String]]("t", noopDeser)
    assert(SparkKafkaOptions.forTopic(t, 0L) ==
      Map("subscribe" -> "t", "startingOffsets" -> "earliest"))
    val abs = SourceTopic.fromAbsoluteTime[List[String]]("t", noopDeser, ts("2023-01-01T00:00:00Z"))
    assert(SparkKafkaOptions.forTopic(abs, 0L)("startingTimestamp") == "1672531200000")
  }
}
