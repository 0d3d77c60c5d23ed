package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Greedy set cover vs an independent in-memory replay of the same greedy
  * rule — any divergence means the distributed argmax or the anti-join
  * coverage removal diverged from the (gain desc, doc_id asc) contract. */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteGreedy(sets: Map[Long, Set[String]],
      maxRounds: Int): Seq[(Long, Long, Long)] = {
    var covered = Set.empty[String]
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var r = 1
    var stop = false
    while (r <= maxRounds && !stop) {
      val gains = sets.map { case (d, s) => d -> (s -- covered).size.toLong }
      val best = gains.filter(_._2 > 0)
      if (best.isEmpty) stop = true
      else {
        val (doc, gain) = best.minBy { case (d, g) => (-g, d) }
        out += ((r.toLong, doc, gain))
        covered = covered ++ sets(doc)
      }
      r += 1
    }
    out.toSeq
  }

  private def run(sets: Map[Long, Set[String]], maxRounds: Int): Seq[(Long, Long, Long)] = {
    val pairs = sets.toSeq.flatMap { case (d, s) => s.map(w => (d, w)) }
    Selection.greedyCover(spark, pairs.toDF("doc_id", "w"), maxRounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("random set family matches the in-memory greedy exactly") {
    val rnd = new scala.util.Random(13)
    val univ = (0 until 60).map(i => s"e$i")
    val sets = (0L until 25L).map(d =>
      d -> rnd.shuffle(univ).take(1 + rnd.nextInt(12)).toSet).toMap
    assert(run(sets, 10) == bruteGreedy(sets, 10))
  }

  test("stops early once everything is covered; tie goes to smallest doc_id") {
    // docs 7 and 3 both cover {a,b}; 3 must win the tie, then 9 adds {c}
    val sets = Map(7L -> Set("a", "b"), 3L -> Set("a", "b"), 9L -> Set("b", "c"))
    assert(run(sets, 8) == Seq((1L, 3L, 2L), (2L, 9L, 1L)))
  }

  test("docBigrams: distinct bigrams per doc; single-token docs contribute nothing") {
    val docs = Seq((1L, "a b a b"), (2L, "x"), (3L, "p q r"))
      .toDF("doc_id", "text")
    val got = Selection.docBigrams(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a b"), (1L, "b a"), (3L, "p q"), (3L, "q r")))
  }
}
