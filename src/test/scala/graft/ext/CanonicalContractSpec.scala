package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the unchecked caller assertions behind the r14/r15 shuffle
  * eliminations (ADVICE r14 medium): `canonicalInput = true` and the
  * trace-prefix/trace-readout reuses skip work ONLY because their inputs
  * satisfy a contract — these tests keep the skipping paths equal to the
  * full paths on data that exercises ties, duplicates-after-symmetrize,
  * and multi-community structure. */
class CanonicalContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def canonicalSample() = {
    val rnd = new scala.util.Random(151)
    val raw = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    spark.createDataFrame(raw).toDF("a", "b")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("labelPropagation(canonicalInput = true) ≡ default path on canonical edges") {
    val e = canonicalSample()
    for (r <- Seq(1, 2, 3)) {
      val fast = rows(Graphs.labelPropagation(e, r, canonicalInput = true))
      val full = rows(Graphs.labelPropagation(e, r))
      assert(fast == full, s"rounds = $r")
    }
  }

  test("labelPropagationTrace prefix ≡ independent shorter runs") {
    val e = canonicalSample()
    val trace = Graphs.labelPropagationTrace(e, rounds = 3, canonicalInput = true)
    for (r <- Seq(1, 2, 3))
      assert(rows(trace(r - 1)) ==
        rows(Graphs.labelPropagation(e, r, canonicalInput = true)),
        s"trace round $r != labelPropagation rounds = $r")
  }

  test("basketPairs ≡ the old self-join formulation (dups, singletons, ties)") {
    val items = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // dup item in basket
      (2L, 11L), (2L, 10L),                       // unsorted arrival
      (3L, 5L),                                   // singleton: no pairs
      (4L, 7L), (4L, 7L),                         // all-dup singleton
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    val df = spark.createDataFrame(items).toDF("ok", "pk")
    val d = df.select(col("ok"), col("pk")).distinct()
    val selfJoin = d.as("x").join(d.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    assert(rows(Graphs.basketPairs(df)) == rows(selfJoin))
    // per-basket multiset equality (the support-counting contract)
    val perBasket = Graphs.basketPairsPerBasket(df)
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val perBasketJoin = d.as("x").join(d.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk"), col("y.pk")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(perBasket == perBasketJoin)
  }

  test("basketPairsPerBasket mega-basket guard fails loudly, not silently") {
    val big = spark.range(0, 50).select(lit(9L).as("ok"), col("id").as("pk"))
    val ex = intercept[Exception] {
      Graphs.basketPairsPerBasket(big, maxBasketSize = 10).collect()
    }
    assert(ex.getMessage != null)
  }

  test("kTrussEdgesFromTrace(trace) ≡ kTrussEdges (one peel, same readout)") {
    val e = canonicalSample()
    val trace = Graphs.kTrussTrace(e, k = 3, rounds = 2)
    val a = Graphs.kTrussEdgesFromTrace(trace, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graphs.kTrussEdges(e, k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
