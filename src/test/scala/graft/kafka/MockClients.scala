package graft.kafka

import scala.collection.mutable

import graft.core.Time.Nanos

/** Shared in-memory clients for the Kafka-layer suites (reference
  * `MockConsumer`/`MockProducer`, tests/test_kafka.py:69-163). Extracted so
  * the [[ConsumerClientContract]] suite can run the same scenarios over any
  * client implementation. */
object MockClients {
  def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** topicsData: topic -> partitions -> ordered (timestampNs, payload). */
  class MockConsumer(topicsData: Map[String, Seq[Seq[(Nanos, String)]]]) extends ConsumerClient {
    val committedOffsets = mutable.Map.empty[TopicPartition, Long]
    private val cursors = mutable.Map.empty[TopicPartition, Long]
    val pausedSet = mutable.Set.empty[TopicPartition]

    override def partitions(topic: String): Seq[Int] =
      topicsData.get(topic).map(_.indices.toSeq).getOrElse(Nil)
    override def watermarkOffsets(tp: TopicPartition): (Long, Long) =
      (0L, topicsData(tp.topic)(tp.partition).size.toLong)
    override def offsetForTime(tp: TopicPartition, timestamp: Nanos): Option[Long] = {
      val idx = topicsData(tp.topic)(tp.partition).indexWhere(_._1 >= timestamp)
      if (idx < 0) None else Some(idx.toLong)
    }
    override def committed(tps: Seq[TopicPartition]): Map[TopicPartition, Long] =
      tps.map(tp => tp -> committedOffsets.getOrElse(tp, 0L)).toMap
    override def assign(offsets: Map[TopicPartition, Long]): Unit =
      offsets.foreach { case (tp, off) => cursors(tp) = off }
    override def poll(timeoutMs: Long): Option[KMessage] = {
      // round-robin over non-paused assigned partitions
      cursors.toSeq.sortBy(t => (t._1.topic, t._1.partition)).foreach { case (tp, off) =>
        if (!pausedSet.contains(tp)) {
          val data = topicsData(tp.topic)(tp.partition)
          if (off < data.size) {
            val (t, v) = data(off.toInt)
            cursors(tp) = off + 1
            return Some(KMessage(tp, off, t, null, utf8(v)))
          }
        }
      }
      None
    }
    override def pause(tps: Seq[TopicPartition]): Unit = pausedSet ++= tps
    override def resume(tps: Seq[TopicPartition]): Unit = pausedSet --= tps
  }

  class MockProducer extends ProducerClient {
    val produced = mutable.ArrayBuffer.empty[(String, String, String)]
    private val pending = mutable.ArrayBuffer.empty[Option[Throwable] => Unit]
    override def produce(topic: String, key: Array[Byte], value: Array[Byte],
        onDelivery: Option[Throwable] => Unit): Unit = {
      produced += ((topic, Option(key).map(new String(_, "UTF-8")).orNull, new String(value, "UTF-8")))
      pending += onDelivery
    }
    override def poll(): Unit = { pending.foreach(_(None)); pending.clear() }
  }

  /** A [[RawConsumer]] (kafka-clients-shaped) over the same in-memory data:
    * batch polls, millisecond timestamps, seek-based positioning. Running
    * the contract suite over `new RawConsumerAdapter(new MockRawConsumer(..))`
    * exercises the production adapter path end-to-end. Timestamps given in
    * nanos are floored to ms like a real broker would store them — use
    * whole-ms test data. `tsMs < 0` marks TIMESTAMP_NOT_AVAILABLE. */
  class MockRawConsumer(topicsData: Map[String, Seq[Seq[(Nanos, String)]]]) extends RawConsumer {
    private val cursors = mutable.Map.empty[TopicPartition, Long]
    private val paused = mutable.Set.empty[TopicPartition]
    val committedOffsets = mutable.Map.empty[TopicPartition, Long]

    override def partitionsFor(topic: String): Seq[Int] =
      topicsData.get(topic).map(_.indices.toSeq).getOrElse(Nil)
    override def beginningOffsets(tps: Seq[TopicPartition]): Map[TopicPartition, Long] =
      tps.map(_ -> 0L).toMap
    override def endOffsets(tps: Seq[TopicPartition]): Map[TopicPartition, Long] =
      tps.map(tp => tp -> topicsData(tp.topic)(tp.partition).size.toLong).toMap
    override def offsetsForTimes(query: Map[TopicPartition, Long]): Map[TopicPartition, Option[Long]] =
      query.map { case (tp, tsMs) =>
        val idx = topicsData(tp.topic)(tp.partition).indexWhere(_._1 / 1000000L >= tsMs)
        tp -> (if (idx < 0) None else Some(idx.toLong))
      }
    override def committed(tps: Seq[TopicPartition]): Map[TopicPartition, Option[Long]] =
      tps.map(tp => tp -> committedOffsets.get(tp)).toMap
    override def assign(tps: Seq[TopicPartition]): Unit =
      tps.foreach(tp => cursors.getOrElseUpdate(tp, 0L))
    override def seek(tp: TopicPartition, offset: Long): Unit = cursors(tp) = offset
    override def poll(timeoutMs: Long): Seq[RawRecord] = {
      val out = mutable.ArrayBuffer.empty[RawRecord]
      cursors.toSeq.sortBy(t => (t._1.topic, t._1.partition)).foreach { case (tp, off) =>
        if (!paused.contains(tp)) {
          val data = topicsData(tp.topic)(tp.partition)
          var o = off
          while (o < data.size && out.size < 100) {
            val (t, v) = data(o.toInt)
            out += RawRecord(tp.topic, tp.partition, o, t / 1000000L, t > 0, null, utf8(v))
            o += 1
          }
          cursors(tp) = o
        }
      }
      out.toSeq
    }
    override def pause(tps: Seq[TopicPartition]): Unit = paused ++= tps
    override def resume(tps: Seq[TopicPartition]): Unit = paused --= tps
  }
}
