package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer power iteration for the dominant embedding direction (q138). */
class TopPcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("recovers a planted dominant direction (cos > 0.99 after 6 iterations)") {
    // corpus = strong signal along u = (3,4,0,...)/5 plus small fixed noise
    val d = 8
    val u = Array(0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val rows = (0 until 200).map { i =>
      val a = if (i % 2 == 0) 5.0 else -5.0 // signal dominates both signs
      val noise = Array.tabulate(d)(k => (((i * 7 + k * 3) % 11) - 5) * 0.05)
      (i.toLong, Array.tabulate(d)(k => (a * u(k) + noise(k)).toFloat).toSeq)
    }
    val v = Similarity.topPcVector(vecs(rows), "embedding", dims = d, iters = 6)
    val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos = math.abs(v.zip(u).map { case (a, b) => a.toDouble * b }.sum) / vn
    assert(cos > 0.99, s"cos to planted direction: $cos, v=${v.mkString(",")}")
  }

  test("Gram cells and projections are repartition-invariant (pure integer sums)") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(6)(k => (((i * 13 + k * 7) % 9) - 4) * 0.7f))
    }
    val df = vecs(rows)
    val a = Similarity.topPcProjections(df.repartition(1), "embedding", "vec_id", 6)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Similarity.topPcProjections(df.repartition(11), "embedding", "vec_id", 6)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    // Gram is symmetric by construction
    val g = Similarity.gramCells(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 1 to 6; j <- 1 to 6) assert(g((i, j)) == g((j, i)), s"($i,$j)")
    assert(df.select(col("vec_id")).count() == 60)
  }

  test("shift normalization keeps components near 2^20 and matches floor-div semantics") {
    val w = Array(-5L, -1L, 3L << 40, 7L)
    val maxAbs = w.map(math.abs).max
    val k = math.max((64 - java.lang.Long.numberOfLeadingZeros(maxAbs)) - 20, 0)
    val v = w.map(_ >> k)
    assert(v.map(math.abs).max <= (1L << 20))
    assert((-5L >> 1) == -3L, "arithmetic shift floors on negatives (DuckDB >> agrees)")
  }
}
