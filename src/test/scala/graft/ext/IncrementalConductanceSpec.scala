package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalConductance]] — the fourteenth maintained form
  * (the incrementalModularity pattern over the boundary readout).
  * Coverage map: random waves with relabeling (≡ batch), POISON
  * pass-through (an untouched community's stats carried verbatim), the
  * m-globality rescale (stats verbatim, phi_ppm still moves — the
  * q318 case), and the third-community cut precision argument (a
  * relabel between two communities leaves a third's cut untouched). */
class IncrementalConductanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Map[Long, (Long, Long, Long, Long)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def frame(edges: Seq[(Long, Long)]) = edges.toDF("a", "b")
  private def labFrame(l: Seq[(Long, Long)]) = l.toDF("node", "lab")

  test("random waves + relabeling: maintained stats equal the one-shot batch frame") {
    for (seed <- Seq(11, 37, 59)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(160)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val base = all.filter(e => (e._1 + e._2) % 2 == 0)
      val delta = all.filter(e => (e._1 + e._2) % 2 == 1)
      val nodes = all.flatMap(e => Seq(e._1, e._2)).distinct
      val prevL = nodes.map(n => n -> (n % 4))
      val newL = prevL.map { case (n, l) =>
        n -> (if (rnd.nextInt(3) == 0) (l + 1) % 4 else l)
      }
      val inc = Graphs.incrementalConductance(
        Graphs.conductanceByCommunity(frame(base), labFrame(prevL)),
        labFrame(prevL), labFrame(newL), frame(base), frame(delta))
      val batch = Graphs.conductanceByCommunity(frame(all), labFrame(newL))
      assert(rows(inc) == rows(batch), s"seed $seed: incremental != batch")
    }
  }

  test("ball-sized relabel diff (lpaRounds > 0): equal to batch AND to the full-diff path") {
    // labels genuinely maintained by incrementalLabelPropagation, so the
    // lpaRounds contract holds; the ball-restricted diff must reproduce
    // both the one-shot batch readout and the lpaRounds = 0 output
    for (seed <- Seq(7, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      val all = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val base = all.filter(e => (e._1 * 7 + e._2) % 3 != 0)
      val delta = all.filter(e => (e._1 * 7 + e._2) % 3 == 0)
      val prevL = Graphs.labelPropagation(frame(base), rounds = 2)
        .localCheckpoint(true)
      val newL = Graphs.incrementalLabelPropagation(
        prevL, frame(base), frame(delta), rounds = 2).localCheckpoint(true)
      val stats = Graphs.conductanceByCommunity(frame(base), prevL)
        .localCheckpoint(true)
      val ballPath = Graphs.incrementalConductance(
        stats, prevL, newL, frame(base), frame(delta), lpaRounds = 2)
      val fullPath = Graphs.incrementalConductance(
        stats, prevL, newL, frame(base), frame(delta))
      val batch = Graphs.conductanceByCommunity(
        frame((base ++ delta).distinct), newL)
      assert(rows(ballPath) == rows(batch), s"seed $seed: ball path != batch")
      assert(rows(ballPath) == rows(fullPath), s"seed $seed: ball != full diff")
    }
  }

  test("POISON: an untouched community's stats pass through verbatim") {
    // A (0-3) touched by the delta; B (10-12 triangle) untouched
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val delta = Seq((0L, 2L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    val stats = Graphs.conductanceByCommunity(frame(base), labFrame(labels))
    val poisoned = stats.withColumn("cut",
      when(col("label") === 10L, col("cut") + 7L).otherwise(col("cut")))
    val out = rows(Graphs.incrementalConductance(
      poisoned, labFrame(labels), labFrame(labels), frame(base), frame(delta)))
    assert(out(10L)._3 == 0L + 7L, "poison must survive: stats were recomputed")
    val batch = rows(Graphs.conductanceByCommunity(
      frame(base ++ delta), labFrame(labels)))
    assert(out(0L) == batch(0L), "the touched community IS recomputed")
  }

  test("m-globality: untouched stats verbatim, phi_ppm still rescaled by the new m") {
    // B is the BIG side (its phi denominator is the complement
    // 2m − vol), and the delta grows m inside A only: B's
    // (n_nodes, vol, cut) pass through verbatim while phi MOVES —
    // the q304/q318 globality shape
    val base = Seq((0L, 1L), (1L, 10L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val delta = Seq((0L, 2L), (1L, 2L)) // grows m by 2, A only
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    val before = rows(Graphs.conductanceByCommunity(frame(base), labFrame(labels)))
    // base m = 5: B vol = 7, cut = 1, min(7, 10−7=3) -> 333333
    assert(before(10L) == ((3L, 7L, 1L, 333333L)))
    val out = rows(Graphs.incrementalConductance(
      Graphs.conductanceByCommunity(frame(base), labFrame(labels)),
      labFrame(labels), labFrame(labels), frame(base), frame(delta)))
    val batch = rows(Graphs.conductanceByCommunity(
      frame(base ++ delta), labFrame(labels)))
    assert(out == batch)
    // new m = 7: B stats verbatim, min(7, 14−7=7) -> 142857
    assert(out(10L) == ((3L, 7L, 1L, 142857L)),
      "stats verbatim, phi rescaled by the new m")
  }

  test("third-community precision: a relabel between two communities leaves a third verbatim") {
    // x moves c0 -> c1; community c2 shares an edge with x — its cut
    // status for that edge is cross before AND after, so c2 must NOT
    // be recomputed (pinned by poisoning c2)
    val base = Seq((0L, 1L), (2L, 3L), (4L, 5L), (0L, 4L))
    val prevL = Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L)
    val newL = Seq(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L)
    val delta = Seq.empty[(Long, Long)]
    val stats = Graphs.conductanceByCommunity(frame(base), labFrame(prevL))
    val poisoned = stats.withColumn("cut",
      when(col("label") === 2L, col("cut") + 99L).otherwise(col("cut")))
    val out = rows(Graphs.incrementalConductance(
      poisoned, labFrame(prevL), labFrame(newL), frame(base),
      frame(delta)))
    assert(out(2L)._3 == 1L + 99L, s"community 2 must be verbatim: $out")
    val batch = rows(Graphs.conductanceByCommunity(frame(base), labFrame(newL)))
    assert(out(0L) == batch(0L) && out(1L) == batch(1L))
  }
}
