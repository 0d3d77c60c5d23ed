package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SemDeDup against an independent in-memory reference: same deterministic
  * centroid set (lowest ids), argmax-with-tie-break assignment, and
  * pairwise-dominance removal, computed with plain Scala loops (left-to-
  * right double sums — the engine-wide fold order). */
class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  private def reference(vecs: Map[Long, Array[Float]], k: Int, eps: Double)
      : Map[Long, (Long, Boolean)] = {
    val cents = vecs.filter(_._1 < k).toSeq.sortBy(_._1)
    val assign = vecs.map { case (id, v) =>
      val (cid, ccos) = cents.map { case (c, cv) =>
        (c, dot(v, cv) / (nrm(v) * nrm(cv)))
      }.maxBy { case (c, s) => (s, -c) } // best sim, tie -> lowest cid
      id -> (cid, ccos)
    }
    assign.map { case (id, (cid, ccos)) =>
      val removed = assign.exists { case (y, (ycid, yccos)) =>
        ycid == cid && y != id &&
          (yccos < ccos || (yccos == ccos && y < id)) &&
          dot(vecs(id), vecs(y)) / (nrm(vecs(id)) * nrm(vecs(y))) >= eps
      }
      id -> (cid, !removed)
    }
  }

  test("matches the independent reference, including exact-duplicate tie-breaks") {
    val rnd = new scala.util.Random(3)
    val dim = 8
    def vec() = Array.fill(dim)((rnd.nextGaussian() * 0.3 + 0.5).toFloat)
    val base = Seq.tabulate(10)(_ => vec())
    val vecs: Map[Long, Array[Float]] = (0 until 80).map { i =>
      val v =
        if (i % 7 == 0 && i > 10) base(i % base.size).clone() // exact dup: tie path
        else if (i % 3 == 0) base(i % base.size).map(x => x + rnd.nextGaussian().toFloat * 0.01f)
        else vec()
      i.toLong -> v
    }.toMap
    val df = vecs.toSeq.sortBy(_._1).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "embedding", "vec_id", eps = 0.9, numCentroids = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val want = reference(vecs, k = 8, eps = 0.9)
    assert(got == want)
    // the corpus above must actually exercise removals and keeps
    assert(got.values.exists(!_._2) && got.values.exists(_._2))
  }

  test("eps above every pairwise cosine keeps everything") {
    val rnd = new scala.util.Random(9)
    val df = (0 until 30).map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(df, "embedding", "vec_id", eps = 1.01, numCentroids = 4)
      .collect()
    assert(got.length == 30 && got.forall(_.getBoolean(3)))
  }
}
