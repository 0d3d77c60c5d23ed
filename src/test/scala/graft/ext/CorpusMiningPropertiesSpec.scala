package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property-based invariants for the corpus-mining operators over random
  * corpora: bounds, cross-operator consistency (a doc with no duplicated
  * spans loses no tokens), and the anomaly integer-cut == double-cut
  * identity under adversarial count distributions. (Direct Gen sampling —
  * the scalatest/scalacheck bridge isn't in the offline dependency set;
  * Spark jobs are slow, so runs are few but each covers a whole corpus.) */
class CorpusMiningPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def forAll[A](gen: Gen[A], runs: Int = 6)(f: A => Unit): Unit =
    (0 until runs).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // random corpora over a tiny vocabulary (guarantees shared n-grams)
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n + 1, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))

  test("property: dup-span rate bounded, and zero dup spans <=> zero removal") {
    import spark.implicits._
    forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rate = CorpusMining.repeatedNgramRate(docs, "text", "doc_id", 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val removed = CorpusMining.removeRepeatedSpans(docs, "text", "doc_id", 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

      rate.foreach { case (id, (spans, dup, frac)) =>
        assert(dup >= 0 && dup <= spans)
        assert(frac >= 0.0 && frac <= 1.0)
        // consistency: dup spans exist exactly when tokens get removed
        assert((dup > 0) == (removed(id)._2 > 0), s"doc $id: dup=$dup removed=${removed(id)}")
      }
      removed.foreach { case (id, (n, rm)) =>
        assert(rm >= 0 && rm <= n)
        // every doc is reported by the rebuild (unlike the rate, which
        // skips docs shorter than n)
        assert(n == texts(id.toInt).split(" ").length.toLong)
      }
    }
  }

  test("property: gini in [0, 1) and invariant under value permutation") {
    import spark.implicits._
    val valuesGen = Gen.listOfN(20, Gen.chooseNum(1L, 50L))
    forAll(valuesGen) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => ("g", x, i.toLong) }.toDF("grp", "x", "id")
      val g = CorpusMining.giniByGroup(df, "grp", col("x"), col("id"))
        .collect()(0).getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini=$g for $xs")
      val shuffled = scala.util.Random.shuffle(xs)
      val df2 = shuffled.zipWithIndex.map { case (x, i) => ("g", x, i.toLong) }.toDF("grp", "x", "id")
      val g2 = CorpusMining.giniByGroup(df2, "grp", col("x"), col("id"))
        .collect()(0).getDouble(3)
      assert(g == g2, "gini is a function of the multiset, not the order")
    }
  }

  test("property: anomaly integer cut == |z| > 2 on adversarial hourly counts") {
    import spark.implicits._
    val hour = 3600000000000L
    val countsGen = Gen.listOfN(12, Gen.chooseNum(0, 60))
    forAll(countsGen, runs = 8) { counts =>
      val ev = counts.zipWithIndex.flatMap { case (c, h) =>
        Seq.fill(c + 1)(("t", h * hour + 1L)) // +1 event so every hour exists
      }.toDF("event_type", "ts")
      CorpusMining.hourlyAnomalies(ev, "event_type", "ts").collect().foreach { r =>
        val z = r.getDouble(3); val flag = r.getLong(4)
        assert((math.abs(z) > 2.0) == (flag == 1L), s"z=$z flag=$flag counts=$counts")
      }
    }
  }

  test("property: |pearson r| <= 1 on random integer pairs; invariant under repartition") {
    import spark.implicits._
    val pairsGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 300L), Gen.chooseNum(0L, 1000L)))
    forAll(pairsGen) { xs =>
      val df = xs.toDF("a", "b")
      val r = CorpusMining.pearsonIntGrid(df, col("a"), col("b")).collect()(0).getDouble(1)
      assert(r >= -1.0 && r <= 1.0, s"r=$r")
      val r2 = CorpusMining.pearsonIntGrid(df.repartition(7), col("a"), col("b"))
        .collect()(0).getDouble(1)
      assert(r == r2, "integer moments are partition-invariant")
    }
  }

  test("property: weightedSample keeps weight-0 rows never, weight>=cap rows always; repartition-invariant") {
    import spark.implicits._
    forAll(Gen.listOfN(30, Gen.chooseNum(0L, 600L)), runs = 4) { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => (s"id$i", w) }.toDF("id", "w")
      val kept = Sampling.weightedSample(df, "id", col("w"), 512)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(kept.forall(_._2 > 0L))
      val always = ws.zipWithIndex.filter(_._1 >= 512).map { case (_, i) => s"id$i" }.toSet
      assert(always.subsetOf(kept.map(_._1).toSet))
      val kept2 = Sampling.weightedSample(df.repartition(5), "id", col("w"), 512)
        .collect().map(_.getString(0)).toSet
      assert(kept2 == kept.map(_._1).toSet)
    }
  }

  test("property: tf-idf top-k rank is dense from 1 and scores nonincreasing per doc") {
    import spark.implicits._
    forAll(corpusGen, runs = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = CorpusMining.tfidfKeywords(docs, "text", "doc_id", 3)
        .orderBy("doc_id", "rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val ranks = rs.map(_._2).toSeq
        assert(ranks == (1L to ranks.length).toSeq)
        val scores = rs.map(_._3).toSeq
        assert(scores == scores.sorted.reverse, s"scores not nonincreasing: $scores")
      }
    }
  }
}
