package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.betweennessCentrality]] against an independent in-memory
  * Brandes twin (same hop bound, same ppm floor-division recurrence), plus
  * hand-checked fixtures where the dependency values are derivable on
  * paper: the diamond (tied shortest paths split σ proportionally), the
  * path (dependencies telescope), the double star (the center carries
  * every cross pair), and hop-bound truncation. */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 1000000L

  private def got(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, (Long, Long)] =
    Graphs.betweennessCentrality(edges.toDF("src", "dst"),
        seeds.toDF("seed"), rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** independent twin: per-seed BFS with path counts, then the identical
    * floor-div dependency ladder, accumulated in plain Longs */
  private def brute(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, (Long, Long)] = {
    val adj = edges.distinct.groupMap(_._1)(_._2)
    val bc = scala.collection.mutable.Map.empty[Long, Long]
    val through = scala.collection.mutable.Map.empty[Long, Long]
    for (s <- seeds.distinct) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      val byLevel = scala.collection.mutable.Map(0 -> Seq(s))
      for (r <- 1 to rounds) {
        val cand = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj.getOrElse(v, Nil) if !dist.contains(w))
          cand(w) = cand.getOrElse(w, 0L) + sigma(v)
        frontier = cand.keys.toSeq.sorted
        dist ++= frontier.map(_ -> r)
        sigma ++= cand
        byLevel(r) = frontier
      }
      val dd = scala.collection.mutable.Map.empty[Long, Long]
      for (r <- (rounds - 1) to 1 by -1; v <- byLevel.getOrElse(r, Nil)) {
        val terms = adj.getOrElse(v, Nil)
          .filter(w => dist.get(w).contains(r + 1))
          .map(w => (sigma(v) * (S + dd.getOrElse(w, 0L))) / sigma(w))
        dd(v) = terms.sum
      }
      for (r <- 1 to rounds; v <- byLevel.getOrElse(r, Nil)) {
        val d = dd.getOrElse(v, 0L)
        bc(v) = bc.getOrElse(v, 0L) + d
        if (d > 0L) through(v) = through.getOrElse(v, 0L) + 1L
      }
    }
    // emit every node reached by >= 1 seed at level >= 1 (0 rows count)
    val reached = seeds.distinct.flatMap { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Seq(s)
      (1 to rounds).flatMap { _ =>
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .distinct.filterNot(dist.contains)
        dist ++= frontier.map(_ -> 1)
        frontier
      }
    }.distinct
    reached.map(v => v -> ((bc.getOrElse(v, 0L), through.getOrElse(v, 0L)))).toMap
  }

  test("diamond: tied shortest paths split the dependency 50/50 (floor-exact)") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val r = got(edges, Seq(0L), 2)
    assert(r == Map(1L -> ((S / 2, 1L)), 2L -> ((S / 2, 1L)), 3L -> ((0L, 0L))))
  }

  test("path: dependencies telescope toward the seed") {
    val edges = (0L until 4L).map(i => (i, i + 1))
    val r = got(edges, Seq(0L), 4)
    assert(r == Map(1L -> ((3 * S, 1L)), 2L -> ((2 * S, 1L)),
      3L -> ((S, 1L)), 4L -> ((0L, 0L))))
  }

  test("double star: the center carries every in×out pair") {
    val edges = (1L to 3L).map(i => (i, 0L)) ++ (4L to 6L).map(j => (0L, j))
    val r = got(edges, Seq(1L, 2L, 3L), 2)
    // from each in-spoke seed: delta(center) = 3 pairs * S
    assert(r(0L) == ((9 * S, 3L)))
    for (j <- 4L to 6L) assert(r(j) == ((0L, 0L)))
  }

  test("hop bound truncates pair contributions, never redistributes them") {
    val edges = (0L until 5L).map(i => (i, i + 1))
    val r2 = got(edges, Seq(0L), 2)
    assert(r2 == Map(1L -> ((S, 1L)), 2L -> ((0L, 0L))))
    val r3 = got(edges, Seq(0L), 3)
    assert(r3(1L) == ((2 * S, 1L)) && r3(2L) == ((S, 1L)) && r3(3L) == ((0L, 0L)))
  }

  test("random directed graphs match the in-memory twin (two seeds sets, two radii)") {
    for (rndSeed <- Seq(29, 61); rounds <- Seq(2, 4)) {
      val rnd = new scala.util.Random(rndSeed)
      val edges = Seq.fill(180)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, 7L, 19L)
      assert(got(edges, seeds, rounds) == brute(edges, seeds, rounds),
        s"seed $rndSeed rounds $rounds diverged from the twin")
    }
  }
}
