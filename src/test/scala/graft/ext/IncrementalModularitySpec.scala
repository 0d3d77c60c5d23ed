package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalModularity]] — the maintained quality readout.
  * Contract: for ANY base/delta edge split and ANY prev→new label pair,
  * folding the delta into the base stats equals the one-shot
  * [[Graphs.modularityByCommunity]] over the full graph with the new
  * labels. Coverage map (the incremental-family house pattern): random
  * waves (≡ batch), POISON pass-through (untouched stats are carried
  * verbatim, provably not recomputed), label migration, new nodes, and
  * the m-globality rescale (stats verbatim, q_ppm still moves). */
class IncrementalModularitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Map[Long, (Long, Long, Long, Long)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def frame(edges: Seq[(Long, Long)]) = edges.toDF("a", "b")
  private def labFrame(l: Seq[(Long, Long)]) = l.toDF("node", "lab")

  test("random waves: maintained stats equal the one-shot batch frame") {
    for (seed <- Seq(7, 19, 53)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(160)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val base = all.filter(e => (e._1 + e._2) % 2 == 0)
      val delta = all.filter(e => (e._1 + e._2) % 2 == 1)
      val nodes = all.flatMap(e => Seq(e._1, e._2)).distinct
      val prevL = nodes.map(n => n -> (n % 4))
      // relabel ~1/3 of the nodes
      val newL = prevL.map { case (n, l) =>
        n -> (if (rnd.nextInt(3) == 0) (l + 1) % 4 else l)
      }
      val inc = Graphs.incrementalModularity(
        Graphs.modularityByCommunity(frame(base), labFrame(prevL)),
        labFrame(prevL), labFrame(newL), frame(base), frame(delta))
      val batch = Graphs.modularityByCommunity(frame(all), labFrame(newL))
      assert(rows(inc) == rows(batch), s"seed $seed: incremental != batch")
    }
  }

  test("POISON: an untouched community's stats pass through verbatim, not recomputed") {
    // component A (nodes 0-3, labels 0) touched by the delta;
    // component B (nodes 10-12 triangle, label 10) untouched
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val delta = Seq((0L, 2L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    val stats = Graphs.modularityByCommunity(frame(base), labFrame(labels))
    // poison B's intra_edges (+7): a recompute would erase it; the
    // verbatim anti-join path must carry it into the output
    val poisoned = stats.withColumn("intra_edges",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("label") === 10L,
        org.apache.spark.sql.functions.col("intra_edges") + 7L)
        .otherwise(org.apache.spark.sql.functions.col("intra_edges")))
    val out = rows(Graphs.incrementalModularity(
      poisoned, labFrame(labels), labFrame(labels), frame(base), frame(delta)))
    assert(out(10L)._3 == 3L + 7L, "poison must survive: stats were recomputed")
    // and the touched community IS recomputed (poison-free ground truth)
    val batch = rows(Graphs.modularityByCommunity(
      frame(base ++ delta), labFrame(labels)))
    assert(out(0L) == batch(0L))
  }

  test("m-globality: untouched stats verbatim, q_ppm still rescaled by the new m") {
    val base = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
    val delta = Seq((0L, 2L)) // inside community 0 only
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    val before = rows(Graphs.modularityByCommunity(frame(base), labFrame(labels)))
    val out = rows(Graphs.incrementalModularity(
      Graphs.modularityByCommunity(frame(base), labFrame(labels)),
      labFrame(labels), labFrame(labels), frame(base), frame(delta)))
    val batch = rows(Graphs.modularityByCommunity(
      frame(base ++ delta), labFrame(labels)))
    assert(out == batch)
    // community 10: untouched counts, but m went 5 -> 6 so q_ppm moved
    assert(out(10L)._1 == before(10L)._1 && out(10L)._2 == before(10L)._2
      && out(10L)._3 == before(10L)._3)
    assert(out(10L)._4 != before(10L)._4, "q_ppm must rescale with the new m")
  }

  test("label migration and new nodes recount both sides of the move") {
    val base = Seq((0L, 1L), (1L, 2L), (3L, 4L))
    val delta = Seq((2L, 3L), (4L, 5L)) // node 5 is NEW
    val prevL = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L)
    val newL = Seq(0L -> 0L, 1L -> 0L, 2L -> 3L, // node 2 migrates 0 -> 3
      3L -> 3L, 4L -> 3L, 5L -> 3L)
    val inc = Graphs.incrementalModularity(
      Graphs.modularityByCommunity(frame(base), labFrame(prevL)),
      labFrame(prevL), labFrame(newL), frame(base), frame(delta))
    val batch = Graphs.modularityByCommunity(
      frame(base ++ delta), labFrame(newL))
    assert(rows(inc) == rows(batch))
    assert(rows(inc)(3L)._1 == 4L, "community 3 gained the migrant and the new node")
  }

  test("composed with incremental LPA (the q318 shape): maintained ≡ batch") {
    val rnd = new scala.util.Random(61)
    val all = Seq.fill(120)((rnd.nextInt(26).toLong, rnd.nextInt(26).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val base = all.filter(e => (e._1 + e._2) % 2 == 0)
    val delta = all.filter(e => (e._1 + e._2) % 2 == 1)
    val prevLabels = Graphs.labelPropagation(frame(base), rounds = 2)
    val newLabels = Graphs.incrementalLabelPropagation(
      prevLabels, frame(base), frame(delta), rounds = 2)
    val inc = Graphs.incrementalModularity(
      Graphs.modularityByCommunity(frame(base), prevLabels),
      prevLabels, newLabels, frame(base), frame(delta))
    val batch = Graphs.modularityByCommunity(frame(all),
      Graphs.labelPropagation(frame(all), rounds = 2))
    assert(rows(inc) == rows(batch))
    // ball-restricted relabel diff (lpaRounds = 2, the r14 reshape):
    // identical output to both the full-diff path and the batch readout
    val incBall = Graphs.incrementalModularity(
      Graphs.modularityByCommunity(frame(base), prevLabels),
      prevLabels, newLabels, frame(base), frame(delta), lpaRounds = 2)
    assert(rows(incBall) == rows(batch), "ball path != batch")
  }
}
