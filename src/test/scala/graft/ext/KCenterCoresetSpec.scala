package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Similarity.kCenterCoreset]] — Gonzalez farthest-point traversal in
  * cosine distance. Pins a hand-computed planar trajectory, exact
  * equality with a JVM replica (same left-to-right double fold, so gaps
  * match bit-for-bit), the k=1 and k>n degenerate cases, and duplicate
  * points sorting to the end with gap 0. */
class KCenterCoresetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(pts: Seq[(Long, Seq[Float])], k: Int): Seq[(Long, Long, Double)] =
    Similarity.kCenterCoreset(pts.toDF("vec_id", "embedding"),
        "embedding", "vec_id", k)
      .orderBy(org.apache.spark.sql.functions.col("step"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  /** JVM replica: identical fold order, min/max comparisons, tie rule. */
  private def replica(pts: Seq[(Long, Seq[Float])], k: Int): Seq[(Long, Long, Double)] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def dist(a: Seq[Float], b: Seq[Float]): Double =
      1.0 - dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val byId = pts.sortBy(_._1)
    var centers = Vector((1L, byId.head._1, 0.0))
    var step = 2L
    while (step <= k && centers.size < pts.size) {
      val chosen = centers.map(_._2).toSet
      val cand = byId.filterNot(p => chosen.contains(p._1)).map { p =>
        val g = centers.map(c => dist(p._2, byId.find(_._1 == c._2).get._2)).min
        (p._1, g)
      }
      val best = cand.minBy { case (id, g) => (-g, id) }
      centers :+= ((step, best._1, best._2))
      step += 1
    }
    centers
  }

  test("planar trajectory: opposite point first, then the orthogonal, then the diagonal") {
    val pts = Seq[(Long, Seq[Float])](
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(-1f, 0f),
      3L -> Seq(0.7071f, 0.7071f))
    val out = run(pts, 4)
    assert(out.map(_._2) == Seq(0L, 2L, 1L, 3L))
    assert(out(0)._3 == 0.0)
    assert(math.abs(out(1)._3 - 2.0) < 1e-12, "antipode gap = 1 - (-1)")
    assert(math.abs(out(2)._3 - 1.0) < 1e-12, "orthogonal gap = 1 - 0")
    assert(out(3)._3 < 0.3, "diagonal is near its neighbors")
  }

  test("random corpus: trajectory and gaps equal the JVM replica bit-for-bit") {
    val rnd = new scala.util.Random(71)
    val pts = (0L until 40L).map(id =>
      id -> Seq.fill(16)(rnd.nextFloat() * 2f - 1f))
    assert(run(pts, 10) == replica(pts, 10))
  }

  test("k = 1 returns the lowest id with gap 0") {
    val pts = Seq[(Long, Seq[Float])](7L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))
    assert(run(pts, 1) == Seq((1L, 3L, 0.0)))
  }

  test("k > n stops early; duplicate points arrive last with gap 0") {
    val pts = Seq[(Long, Seq[Float])](
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val out = run(pts, 9)
    assert(out.size == 3)
    assert(out.map(_._2) == Seq(0L, 2L, 1L), "the duplicate of a center goes last")
    assert(out(2)._3 == 0.0, "duplicate gap is exactly zero")
  }
}
