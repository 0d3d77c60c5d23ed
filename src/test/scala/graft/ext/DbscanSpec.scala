package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DBSCAN-style embedding density clustering (q137's operator). */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("hand-built geometry: dense cluster is core, satellite is border, outlier is noise") {
    // Three mutually-close vectors (pairwise cos >= 0.98) each have >= 2
    // neighbors -> all core, one cluster rooted at the min id (10). The
    // satellite reaches eps=0.65 against nearA ONLY (cos 0.677; 0.600 to
    // base, 0.516 to nearB), so its degree is 1 -> border, attached
    // through nearA's root. The orthogonal vector sees nobody -> noise.
    val base = Seq(1f, 0f, 0f, 0f)
    val nearA = Seq(0.99f, 0.1f, 0f, 0f)
    val nearB = Seq(0.99f, -0.1f, 0f, 0f)
    val sat = Seq(0.6f, 0.8f, 0f, 0f)
    val outlier = Seq(0f, 0f, 1f, 0f)
    val df = vecs(Seq(10L -> base, 11L -> nearA, 12L -> nearB, 20L -> sat, 30L -> outlier))
    val got = Similarity.dbscanClusters(df, "embedding", "vec_id", eps = 0.65,
        minPts = 2, tables = 48, bits = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("role"), Option(r.get(r.fieldIndex("root")))))).toMap
    assert(got(10L) == (("core", Some(10L))))
    assert(got(11L) == (("core", Some(10L))))
    assert(got(12L) == (("core", Some(10L))))
    assert(got(20L) == (("border", Some(10L))), s"satellite: ${got(20L)}")
    assert(got(30L) == (("noise", None)))
  }

  test("roles partition the corpus and are repartition-invariant") {
    import spark.implicits._
    val rows = (0 until 80).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (((i * 11 + d * 5) % 13) - 6).toFloat))
    }
    val df = vecs(rows)
    val a = Similarity.dbscanClusters(df.repartition(1), "embedding", "vec_id", 0.4, 3)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = Similarity.dbscanClusters(df.repartition(7), "embedding", "vec_id", 0.4, 3)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 80, "every vector gets a role row")
  }
}
