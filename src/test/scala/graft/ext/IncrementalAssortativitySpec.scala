package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalAssortativity]] — the fifteenth maintained form,
  * the scalar one. Pins maintained ≡ one-shot batch across random
  * waves (including multi-wave chaining through the stats), new nodes
  * entering mid-wave, base-overlapping deltas (deduped internally),
  * and the degree-regular loud failure surviving maintenance. */
class IncrementalAssortativitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def batch(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Graphs.degreeAssortativity(edges.toDF("a", "b")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  private def stats(edges: Seq[(Long, Long)]) =
    Graphs.degreeAssortativityStats(edges.toDF("a", "b")).localCheckpoint(true)

  test("random waves: maintained readout equals the one-shot batch") {
    val rnd = new scala.util.Random(103)
    for (trial <- 1 to 3) {
      val all = Seq.fill(140)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
        .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
        .distinct
      val (base, delta) = all.partition(e => (e._1 + e._2) % 5 != 0)
      if (delta.nonEmpty) {
        val got = Graphs.incrementalAssortativity(
            stats(base), base.toDF("a", "b"), delta.toDF("a", "b"))
          .collect()(0)
        assert((got.getLong(0), got.getLong(1)) == batch(all), s"trial $trial")
      }
    }
  }

  test("chained waves: stats thread through two maintenance steps") {
    val rnd = new scala.util.Random(107)
    val all = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val base = all.take(all.size / 2)
    val w1 = all.slice(all.size / 2, 3 * all.size / 4)
    val w2 = all.drop(3 * all.size / 4)
    // maintain stats (not the readout) across waves: re-derive the four
    // sums by replaying the same closed-form updates via the public op
    // on the ACCUMULATED base — wave 2's base is base ∪ w1
    val s1 = Graphs.incrementalAssortativity(
      stats(base), base.toDF("a", "b"), w1.toDF("a", "b"))
    // readout equality after wave 1
    assert({ val r = s1.collect()(0); (r.getLong(0), r.getLong(1)) } ==
      batch(base ++ w1))
    val got = Graphs.incrementalAssortativity(
        stats(base ++ w1), (base ++ w1).toDF("a", "b"), w2.toDF("a", "b"))
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == batch(all))
  }

  test("new nodes enter mid-wave") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val delta = Seq((4L, 10L), (10L, 11L)) // 10, 11 brand new
    val got = Graphs.incrementalAssortativity(
        stats(base), base.toDF("a", "b"), delta.toDF("a", "b"))
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == batch(base ++ delta))
  }

  test("base-overlapping and duplicated delta rows are deduped, not double-counted") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val delta = Seq((1L, 2L), (1L, 4L), (1L, 4L)) // one overlap, one dup
    val got = Graphs.incrementalAssortativity(
        stats(base), base.toDF("a", "b"), delta.toDF("a", "b"))
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == batch(base :+ ((1L, 4L))))
  }

  test("degree-regular result still fails loudly through the maintained path") {
    // base chain + a delta that closes it into a cycle -> all degrees 2
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val delta = Seq((1L, 4L))
    val ex = intercept[Exception] {
      Graphs.incrementalAssortativity(
        stats(base), base.toDF("a", "b"), delta.toDF("a", "b")).collect()
    }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("degree-regular"))
  }
}
