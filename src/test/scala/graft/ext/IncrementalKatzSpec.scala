package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalKatz]] — the eigen tier's cleanest maintained
  * form. Coverage map (the incremental-family house pattern): random
  * waves (≡ one-shot batch), POISON pass-through outside the forward
  * ball (provably verbatim, not recomputed), the EXACT ball radius
  * (distance iters−1 recomputes, distance iters carries poison), and
  * new-node waves (new srcs, new dsts, chained delta edges). */
class IncrementalKatzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def frame(edges: Seq[(Long, Long)]) = edges.toDF("src", "dst")

  test("random waves: maintained ranks equal the one-shot batch at every seed") {
    for (seed <- Seq(5, 23, 71)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(220)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      val base = all.filter(e => (e._1 + 3 * e._2) % 4 != 0)
      val delta = all.filter(e => (e._1 + 3 * e._2) % 4 == 0)
      val inc = Graphs.incrementalKatz(
        Graphs.integerKatzTrace(frame(base), 4), frame(base), frame(delta), 4)
      val batch = Graphs.integerKatz(frame(all), 4)
      assert(ranks(inc) == ranks(batch), s"seed $seed: incremental != batch")
    }
  }

  test("POISON: nodes outside the forward ball carry base trace values verbatim") {
    // chain 1->2->3->4 plus an UPSTREAM island 10->11; delta hits node 3:
    // affected = forward ball of {3} = {3, 4}; 1, 2, 10, 11 untouched
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val delta = Seq((20L, 3L))
    val trace = Graphs.integerKatzTrace(frame(base), 4)
      .withColumn("r", when(col("node") === 11L && col("t") === 4L,
        col("r") + 999L).otherwise(col("r")))
    val out = ranks(Graphs.incrementalKatz(trace, frame(base), frame(delta), 4))
    val baseFinal = ranks(Graphs.integerKatz(frame(base), 4))
    assert(out(11L) == baseFinal(11L) + 999L,
      "poison must survive: the far node was recomputed, not passed through")
    val batch = ranks(Graphs.integerKatz(frame(base ++ delta), 4))
    assert(out(3L) == batch(3L) && out(4L) == batch(4L),
      "the ball recomputes against the full graph")
    assert(out(20L) == batch(20L), "the new src node appears with its batch rank")
  }

  test("exact ball radius: distance iters-1 recomputes, distance iters passes through") {
    // delta dst 0, chain 0->1->2->3->4->5; iters = 4 => affected = {0,1,2,3}
    // (forward radius 3); node 4 is at distance 4 — OUTSIDE, verbatim
    val base = (0L until 5L).map(i => (i, i + 1))
    val delta = Seq((100L, 0L))
    val poison = (n: Long) => Graphs.integerKatzTrace(frame(base), 4)
      .withColumn("r", when(col("node") === n && col("t") === 4L,
        col("r") + 777L).otherwise(col("r")))
    val outFar = ranks(Graphs.incrementalKatz(poison(4L), frame(base), frame(delta), 4))
    val baseFinal = ranks(Graphs.integerKatz(frame(base), 4))
    assert(outFar(4L) == baseFinal(4L) + 777L,
      "distance-iters node must be anti-join verbatim")
    val outNear = ranks(Graphs.incrementalKatz(poison(3L), frame(base), frame(delta), 4))
    val batch = ranks(Graphs.integerKatz(frame(base ++ delta), 4))
    assert(outNear(3L) == batch(3L),
      "distance-(iters-1) node must be recomputed (poison erased)")
  }

  test("new-node waves: chained delta edges through brand-new nodes") {
    val base = Seq((1L, 2L), (2L, 3L))
    // a chain of NEW nodes feeding back into the base graph
    val delta = Seq((50L, 51L), (51L, 52L), (52L, 1L))
    val inc = Graphs.incrementalKatz(
      Graphs.integerKatzTrace(frame(base), 4), frame(base), frame(delta), 4)
    val batch = Graphs.integerKatz(frame(base ++ delta), 4)
    assert(ranks(inc) == ranks(batch))
    assert(ranks(inc).contains(50L) && ranks(inc).contains(52L))
  }
}
