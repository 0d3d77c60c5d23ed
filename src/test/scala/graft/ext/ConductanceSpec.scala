package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.conductanceByCommunity]] — boundary leakiness in exact
  * integer ppm. Pins the hand-computed bridged-triangles case, the
  * zero-cut clean split, the min(vol, 2m−vol) side selection, a JVM
  * replica on random graphs, and the loud whole-graph failure. */
class ConductanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] =
    Graphs.conductanceByCommunity(edges.toDF("a", "b"), labels.toDF("node", "lab"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def replica(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] = {
    val m = edges.size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val lab = labels.toMap
    lab.values.toSeq.distinct
      .filter(c => deg.keys.exists(n => lab(n) == c))
      .map { c =>
        val members = deg.keys.filter(n => lab(n) == c).toSet
        val vol = members.toSeq.map(deg).sum
        val cut = edges.count(e => members(e._1) != members(e._2)).toLong
        val den = math.min(vol, 2L * m - vol)
        c -> ((members.size.toLong, vol, cut, cut * 1000000L / den))
      }.toMap
  }

  test("two triangles bridged by one edge: phi = 1/7 each side, hand-computed") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L)
    val out = run(edges, labels)
    // m = 7; each side: vol = 7, cut = 1, min(7, 14-7) = 7 -> 142857
    assert(out == Map(0L -> ((3L, 7L, 1L, 142857L)), 3L -> ((3L, 7L, 1L, 142857L))))
  }

  test("a clean split has zero cut and zero phi") {
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 1L, 11L -> 1L)
    val out = run(edges, labels)
    assert(out(0L)._4 == 0L && out(1L)._4 == 0L)
  }

  test("the SMALLER side of the volume governs (min(vol, 2m - vol))") {
    // star center + 4 leaves; singleton community {center}: vol = 4,
    // 2m - vol = 4; a leaf singleton: vol = 1, the min side
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val labels = Seq(0L -> 0L, 1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L)
    val out = run(edges, labels)
    assert(out(0L) == ((1L, 4L, 4L, 1000000L)), "center: 4/min(4,4)")
    assert(out(9L) == ((4L, 4L, 4L, 1000000L)), "leaves: 4/min(4,4)")
  }

  test("random graphs + random labels equal the JVM replica") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val labels = (0L until 30L).map(n => n -> (n % 4))
      assert(run(edges, labels) == replica(edges, labels), s"trial $trial")
    }
  }

  test("a community spanning the whole graph fails loudly (phi undefined)") {
    val edges = Seq((0L, 1L), (1L, 2L))
    val labels = Seq(0L -> 5L, 1L -> 5L, 2L -> 5L)
    val ex = intercept[Exception] { run(edges, labels) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("undefined"))
  }
}
