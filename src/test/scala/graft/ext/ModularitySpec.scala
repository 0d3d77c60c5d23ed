package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.modularityByCommunity]] — integer-ppm Newman modularity per
  * community. Pins the hand-computed two-triangle case, the NEGATIVE
  * contribution (where the +4m²·10⁶ dividend shift must make Spark's
  * truncating `div` behave as a floor — the DuckDB `//` hazard), the
  * zero-intra coalesce, and a full-frame equality against an exact JVM
  * replica of the formula on a random graph. */
class ModularitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] =
    Graphs.modularityByCommunity(edges.toDF("a", "b"), labels.toDF("node", "lab"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("two triangles bridged by one edge: Q_c = 35/196 each, hand-computed ppm") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L)
    val out = run(edges, labels)
    // m = 7; each community: 3 nodes, deg_sum = 7, intra = 3;
    // Q_c = (4*7*3 - 49) / (4*49) = 35/196 -> floor(35e6/196) = 178571
    assert(out == Map(
      0L -> ((3L, 7L, 3L, 178571L)),
      3L -> ((3L, 7L, 3L, 178571L))))
  }

  test("negative contribution floors like DuckDB `//` (the dividend-shift trick)") {
    // path 0-1-2-3, singleton community {0}: Q = -1/36 = -0.0277...
    // floor -> -27778; a truncating division would report -27777.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val labels = Seq(0L -> 9L, 1L -> 1L, 2L -> 1L, 3L -> 1L)
    val out = run(edges, labels)
    assert(out(9L) == ((1L, 1L, 0L, -27778L)))
    // community {1,2,3}: deg_sum = 5, intra = 2; Q = (4*3*2 - 25)/36 = -1/36
    assert(out(1L) == ((3L, 5L, 2L, -27778L)))
  }

  test("community whose edges all cross the boundary reports intra_edges = 0") {
    // star: center 0 labeled apart from its leaves
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val labels = Seq(0L -> 0L, 1L -> 7L, 2L -> 7L, 3L -> 7L)
    val out = run(edges, labels)
    assert(out(0L)._3 == 0L && out(7L)._3 == 0L)
    // m = 3: center Q = (0 - 9)/36 -> floor(-250000) exactly
    assert(out(0L) == ((1L, 3L, 0L, -250000L)))
  }

  test("labeled nodes absent from the graph are excluded (degree comes from edges)") {
    val edges = Seq((0L, 1L))
    val labels = Seq(0L -> 0L, 1L -> 0L, 42L -> 42L)
    val out = run(edges, labels)
    assert(out.keySet == Set(0L))
    // one community holding the whole graph: deg_sum = 2, Q = (4*1*1 - 4)/4 = 0
    assert(out(0L) == ((2L, 2L, 1L, 0L)))
  }

  test("decimal rails: exact at and past the old m >= 1_358_000 long ceiling") {
    // The pre-r13 long path wrapped at 5e6*m^2 > 2^63 (m >= 1_358_200)
    // and raised from 1_358_000; the decimal(38,0) rail must compute
    // EXACTLY there — a 1.4M-edge chain sits past BOTH the old raise
    // and the old wrap point. Alternating labels: every edge crosses.
    assert(5.0e6 * 1400000.0 * 1400000.0 > math.pow(2, 63)) // old path wrapped here
    val m = 1400000L
    val edges = spark.range(m).selectExpr("id as a", "id + 1 as b")
    val labels = spark.range(m + 1)
      .selectExpr("id as node", "cast(id % 2 as long) as lab")
    val out = Graphs.modularityByCommunity(edges, labels)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // BigInt replica of the one shifted floor division per community
    def q(intra: Long, degSum: Long): Long = {
      val bm = BigInt(m)
      ((BigInt(1000000) * (4 * bm * intra - BigInt(degSum) * degSum)
        + BigInt(4000000) * bm * bm) / (4 * bm * bm) - 1000000).toLong
    }
    // chain 0-1-...-1400000: ends have deg 1 (both even — m is even),
    // middles deg 2; intra = 0 for both communities
    val expected = Map(
      0L -> ((m / 2 + 1, m, 0L, q(0L, m))),
      1L -> ((m / 2, m, 0L, q(0L, m))))
    assert(out == expected)
    assert(q(0L, m) == -250000L) // 0 - (m/2m)^2 = -1/4 exactly
  }

  test("random graph + random labels: frame equals an exact JVM replica") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(220)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val labels = (0L until 40L).map(n => n -> (n % 5))
    val out = run(edges, labels)

    val m = edges.size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val labOf = labels.toMap
    val expected = labOf.values.toSeq.distinct.map { c =>
      val nodes = deg.keys.filter(labOf(_) == c).toSeq
      val degSum = nodes.map(deg).sum
      val intra = edges.count(e => labOf(e._1) == c && labOf(e._2) == c).toLong
      val qPpm = (1000000L * (4L * m * intra - degSum * degSum)
        + 4000000L * m * m) / (4L * m * m) - 1000000L
      c -> ((nodes.size.toLong, degSum, intra, qPpm))
    }.toMap
    assert(out == expected)
  }
}
