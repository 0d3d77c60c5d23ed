package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.butterflyCopairs]] / [[Graphs.butterflyCount]] /
  * [[Graphs.incrementalButterflyCopairs]] — the bipartite 2×2-biclique
  * census and its maintained (17th incremental) form. Pins: (1) the
  * census against a driver-side brute-force enumeration on a known
  * fixture; (2) known closed forms (complete bipartite K_{n,m},
  * butterfly-free star); (3) maintained co-pairs ≡ one-shot batch across
  * 3 disjoint-wave schedules, including delta-internal wedges and
  * brand-new left/right vertices; (4) readout-over-maintained ≡ batch
  * census (the composition the q356 oracle certifies). */
class ButterflySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Driver-side reference: enumerate butterflies exactly. */
  private def bruteButterflies(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val byL = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val copair = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byL.values.foreach { rs =>
      for (i <- rs.indices; j <- i + 1 until rs.size)
        copair((rs(i), rs(j))) = copair.getOrElse((rs(i), rs(j)), 0L) + 1L
    }
    val wedges = copair.values.sum
    val bf = copair.values.map(w => w * (w - 1) / 2).sum
    (wedges, copair.size.toLong, bf)
  }

  private val fixture: Seq[(Long, Long)] = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 11L),
    (3L, 11L), (3L, 12L), (3L, 13L),
    (4L, 10L), (4L, 11L), (4L, 12L), (4L, 13L),
    (5L, 13L),
  )

  test("census matches brute-force enumeration on the fixture") {
    val (wedges, coPairs, bf) = bruteButterflies(fixture)
    val row = Graphs.butterflyCount(fixture.toDF("l", "r")).head
    assert(row.getLong(0) == wedges)
    assert(row.getLong(1) == coPairs)
    assert(row.getLong(2) == bf)
  }

  test("closed forms: K_{n,m} has C(n,2)*C(m,2) butterflies; a star has none") {
    val n = 5L; val m = 4L
    val knm = (for (l <- 0L until n; r <- 100L until (100L + m)) yield (l, r))
    val row = Graphs.butterflyCount(knm.toDF("l", "r")).head
    assert(row.getLong(2) == n * (n - 1) / 2 * (m * (m - 1) / 2))
    // star: one left vertex, many rights — wedges but zero butterflies
    val star = (0L until 6L).map(r => (42L, r))
    val srow = Graphs.butterflyCount(star.toDF("l", "r")).head
    assert(srow.getLong(0) == 6L * 5L / 2 && srow.getLong(2) == 0L)
    // empty graph: all-zero census, no raise
    val erow = Graphs.butterflyCount(Seq.empty[(Long, Long)].toDF("l", "r")).head
    assert(erow.getLong(0) == 0L && erow.getLong(1) == 0L && erow.getLong(2) == 0L)
  }

  test("maintained co-pairs ≡ one-shot batch across 3 disjoint-wave schedules") {
    val all = fixture ++ Seq((6L, 10L), (6L, 14L), (7L, 14L), (2L, 14L))
    val batch = sortedRows(Graphs.butterflyCopairs(all.toDF("l", "r")))
    val batchCensus = Graphs.butterflyCount(all.toDF("l", "r")).head.toString
    val schedules = Seq[((Long, Long)) => Int](
      e => ((e._1 + e._2) % 3).toInt,
      e => ((e._1 * 7 + e._2) % 3).toInt,
      e => ((e._1 * 13 + e._2 * 3) % 3).toInt)
    schedules.zipWithIndex.foreach { case (h, si) =>
      var base = all.filter(e => h(e) == 0)
      var pairs = Graphs.butterflyCopairs(base.toDF("l", "r"))
        .localCheckpoint(true)
      (1 to 2).foreach { wv =>
        val delta = all.filter(e => h(e) == wv)
        pairs = Graphs.incrementalButterflyCopairs(pairs,
          base.toDF("l", "r"), delta.toDF("l", "r")).localCheckpoint(true)
        base = base ++ delta
      }
      assert(sortedRows(pairs.where(col("w") > 0)) == batch,
        s"schedule $si: maintained co-pair frame diverged")
      assert(Graphs.butterflyReadout(pairs).head.toString == batchCensus,
        s"schedule $si: maintained census diverged")
    }
  }

  test("participation: per-vertex butterflies sum to 2x the census") {
    val copairs = Graphs.butterflyCopairs(fixture.toDF("l", "r"))
    val part = Graphs.butterflyParticipation(copairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (wedges, _, bf) = bruteButterflies(fixture)
    // every butterfly contains exactly 2 right vertices... it contains 2
    // co-pair memberships x 1 pair = each butterfly counted once per
    // BOTH its right vertices -> sum over r = 2 x census; wedge mass
    // doubles the same way
    assert(part.values.map(_._3).sum == 2 * bf)
    assert(part.values.map(_._2).sum == 2 * wedges)
    // r=13 pairs: (11,13) w=2 via l=3,4 -> 1 butterfly; (12,13) w=2 -> 1;
    // (10,13) w=1 -> 0. So butterflies(13) = 2
    assert(part(13L)._3 == 2L)
  }

  test("delta with brand-new left AND right vertices, plus delta-internal wedges") {
    val base = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    // 8/20/21 are new vertices; (8,20),(8,21) wedge is delta-internal
    val delta = Seq((8L, 20L), (8L, 21L), (2L, 11L), (9L, 20L), (9L, 21L))
    val maintained = Graphs.incrementalButterflyCopairs(
      Graphs.butterflyCopairs(base.toDF("l", "r")),
      base.toDF("l", "r"), delta.toDF("l", "r"))
    val batch = Graphs.butterflyCopairs((base ++ delta).toDF("l", "r"))
    assert(sortedRows(maintained.where(col("w") > 0)) == sortedRows(batch))
    // the (20,21) co-pair reaches w=2 → exactly one NEW butterfly
    assert(Graphs.butterflyReadout(maintained).head.getLong(2) ==
      Graphs.butterflyCount((base ++ delta).toDF("l", "r")).head.getLong(2))
  }
}
