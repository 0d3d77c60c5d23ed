package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalEdgeBetweenness]] — the thirteenth maintained
  * form (the q324 seed-pruning argument applied to the per-LINK trace).
  * Pins chained random waves ≡ one-shot batch, ball-boundary POISON
  * pass-through, and the maintained form's cross-consistency with the
  * maintained NODE form (outgoing edge sums equal node dependencies
  * after the same wave). */
class IncrementalEdgeBetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(edges: Seq[(String, String)]) = edges.toDF("src", "dst")

  private def rollup(df: DataFrame): Map[(String, String), (Long, Long)] =
    df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  private def sym(e: Seq[(String, String)]): Seq[(String, String)] =
    (e ++ e.map(_.swap)).distinct

  test("random waves, chained: maintained trace equals the one-shot batch rollup") {
    for (seedVal <- Seq(23, 31)) {
      val rnd = new scala.util.Random(seedVal)
      val all = sym(Seq.fill(80)((s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}"))
        .filter(e => e._1 != e._2).distinct)
      val tagged = all.map(e => e -> rnd.nextInt(5))
      val base = tagged.filter(_._2 < 3).map(_._1)
      val wave1 = tagged.filter(_._2 == 3).map(_._1)
      val wave2 = tagged.filter(_._2 == 4).map(_._1)
      val seeds = Seq("n1", "n4", "n9").toDF("seed")
      var trace = Graphs.edgeBetweennessTrace(frame(base), seeds, rounds = 4)
      trace = Graphs.incrementalEdgeBetweennessTrace(
        trace, frame(base), frame(wave1), seeds, rounds = 4)
      val out = rollup(Graphs.incrementalEdgeBetweenness(
        trace, frame(base ++ wave1), frame(wave2), seeds, rounds = 4))
      val batch = rollup(Graphs.edgeBetweenness(
        frame(base ++ wave1 ++ wave2), seeds, rounds = 4))
      assert(out == batch, s"seed $seedVal")
    }
  }

  test("ball-boundary POISON: a far seed's edge-trace rows pass through verbatim") {
    val base = sym(Seq(("a0", "a1"), ("a1", "a2"), ("a2", "a3"),
      ("b0", "b1"), ("b1", "b2"), ("b2", "b3")))
    val delta = Seq(("a1", "a3"), ("a3", "a1"))
    val seeds = Seq("a0", "b0").toDF("seed")
    val trace = Graphs.edgeBetweennessTrace(frame(base), seeds, rounds = 3)
    val poisoned = trace.withColumn("term",
      when(col("seed") === "b0", col("term") + 555000000L).otherwise(col("term")))
    val out = rollup(Graphs.incrementalEdgeBetweenness(
      poisoned, frame(base), frame(delta), seeds, rounds = 3))
    assert(out.exists { case ((s, _), (v, _)) => s.startsWith("b") && v >= 555000000L },
      s"poison must survive on B's edges: $out")
    val batch = rollup(Graphs.edgeBetweenness(frame(base ++ delta), seeds, rounds = 3))
    for ((e, v) <- batch if e._1.startsWith("a") && e._2.startsWith("a"))
      assert(out(e) == v, s"A must be recomputed exactly: $e")
  }

  test("cross-consistency after a wave: outgoing edge sums equal maintained node deps") {
    val rnd = new scala.util.Random(43)
    val all = sym(Seq.fill(70)((s"m${rnd.nextInt(12)}", s"m${rnd.nextInt(12)}"))
      .filter(e => e._1 != e._2).distinct)
    val base = all.filter(e => (e._1 + e._2).hashCode % 4 != 0)
    val delta = all.filterNot(base.contains)
    val seeds = Seq("m2", "m5").toDF("seed")
    val edgeTrace = Graphs.incrementalEdgeBetweennessTrace(
      Graphs.edgeBetweennessTrace(frame(base), seeds, rounds = 4),
      frame(base), frame(delta), seeds, rounds = 4)
    val edgeSums = edgeTrace.groupBy(col("node")).agg(sum(col("term")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nodeBc = Graphs.incrementalBetweenness(
        Graphs.betweennessTrace(frame(base), seeds, rounds = 4),
        frame(base), frame(delta), seeds, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seedSet = Set("m2", "m5")
    for ((v, bc) <- nodeBc if !seedSet(v) && edgeSums.contains(v))
      assert(edgeSums(v) == bc, s"node $v: edge sum != maintained node dd")
  }
}
