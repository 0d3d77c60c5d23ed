package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic eval-set decontamination (q135's operator). */
class SemanticContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("a planted copy of an eval vector is flagged; an orthogonal one is not") {
    val base = Seq.tabulate(8)(i => if (i == 0) 1f else 0f)
    val ortho = Seq.tabulate(8)(i => if (i == 1) 1f else 0f)
    val near = Seq.tabulate(8)(i => if (i == 0) 1f else if (i == 1) 0.1f else 0f)
    val corpus = df(Seq((10L, base), (11L, near), (12L, ortho)))
    val evalSet = df(Seq((1L, base)))
    val got = Similarity.semanticContamination(corpus, evalSet,
        "embedding", "vec_id", 0.9, tables = 32, bits = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("contaminated"), Option(r.get(r.fieldIndex("best_eval"))))).toMap
    assert(got(10L)._1, "exact copy must be flagged")
    assert(got(10L)._2.contains(1L))
    assert(got(11L)._1, "cos ~0.995 copy must be flagged")
    assert(!got(12L)._1, "orthogonal vector must not be flagged")
    assert(got.size == 3, "every corpus vector reports a row")
  }

  test("results are invariant under corpus repartitioning") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (((i * 7 + d * 13) % 17) - 8).toFloat))
    }
    val corpus = df(rows.filter(_._1 % 5 != 0L))
    val evalSet = df(rows.filter(_._1 % 5 == 0L))
    val a = Similarity.semanticContamination(corpus.repartition(1), evalSet,
      "embedding", "vec_id", 0.4).orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = Similarity.semanticContamination(corpus.repartition(9), evalSet,
      "embedding", "vec_id", 0.4).orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
