package graft.kafka

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Time.Nanos

/** Property-based priming invariants over random multi-topic timelines:
  * while replaying, releases are globally time-ordered and complete, with
  * bounded held memory, for any batch size. */
class PrimingPropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], runs: Int = 40)(f: A => Unit): Unit =
    (0 until runs).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  val noopDeser: MessageDeserializer[List[String]] =
    (ms: Seq[KMessage]) => ms.map(m => new String(m.value, "UTF-8")).toList

  class GenConsumer(topicsData: Map[String, Seq[Seq[(Nanos, String)]]]) extends ConsumerClient {
    private val cursors = mutable.Map.empty[TopicPartition, Long]
    private val paused = mutable.Set.empty[TopicPartition]
    override def partitions(topic: String): Seq[Int] = topicsData(topic).indices.toSeq
    override def watermarkOffsets(tp: TopicPartition): (Long, Long) =
      (0L, topicsData(tp.topic)(tp.partition).size.toLong)
    override def offsetForTime(tp: TopicPartition, t: Nanos): Option[Long] = {
      val i = topicsData(tp.topic)(tp.partition).indexWhere(_._1 >= t)
      if (i < 0) None else Some(i.toLong)
    }
    override def committed(tps: Seq[TopicPartition]): Map[TopicPartition, Long] =
      tps.map(_ -> 0L).toMap
    override def assign(offsets: Map[TopicPartition, Long]): Unit =
      offsets.foreach { case (tp, o) => cursors(tp) = o }
    override def poll(timeoutMs: Long): Option[KMessage] = {
      cursors.toSeq.sortBy(t => (t._1.topic, t._1.partition)).foreach { case (tp, off) =>
        if (!paused.contains(tp)) {
          val data = topicsData(tp.topic)(tp.partition)
          if (off < data.size) {
            val (t, v) = data(off.toInt)
            cursors(tp) = off + 1
            return Some(KMessage(tp, off, t, null, v.getBytes("UTF-8")))
          }
        }
      }
      None
    }
    override def pause(tps: Seq[TopicPartition]): Unit = paused ++= tps
    override def resume(tps: Seq[TopicPartition]): Unit = paused --= tps
  }

  val timelineGen: Gen[(Map[String, Seq[Seq[(Nanos, String)]]], Int)] = for {
    nTopics <- Gen.choose(1, 3)
    batchSize <- Gen.choose(1, 5)
    topics <- Gen.sequence[List[(String, Seq[Seq[(Nanos, String)]])], (String, Seq[Seq[(Nanos, String)]])](
      (0 until nTopics).map { t =>
        for {
          n <- Gen.choose(0, 25)
          ts <- Gen.listOfN(n, Gen.choose(1L, 1000L))
        } yield s"t$t" -> Seq(ts.sorted.zipWithIndex.map { case (x, i) => (x, s"t$t-$i") })
      }.toList)
  } yield (topics.toMap, batchSize)

  test("priming releases are globally time-sorted, complete, bounded") {
    forAll(timelineGen) { case (data, batchSize) =>
      val total = data.values.flatten.map(_.size).sum
      if (total > 0) {
        val consumer = new GenConsumer(data)
        val manager = ConsumerManager.create(
          consumer,
          data.keys.toSeq.sorted.map(t =>
            SourceTopic[List[String]](t, noopDeser, OffsetPolicy.Earliest)),
          batchSize, nowNs = () => 1000000L) // cutoff far in the future: always "replaying"
        val released = mutable.ArrayBuffer.empty[KMessage]
        var stuck = 0
        while (released.size < total && stuck < 500) {
          val r = manager.poll(0)
          if (r.isEmpty) stuck += 1 else stuck = 0
          released ++= r
          assert(r.size <= batchSize, "release respects the batch cap")
          assert(manager.flushMetrics().heldMessageCount <= batchSize * 5L + batchSize,
            "held buffer stays bounded")
        }
        assert(released.size == total, "every message is eventually released")
        val ts = released.map(_.timestampNs).toList
        assert(ts == ts.sorted, "global event-time order across topics while priming")
        assert(released.map(m => new String(m.value, "UTF-8")).distinct.size == total,
          "exactly-once")
      }
    }
  }
}
