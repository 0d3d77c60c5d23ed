package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** KMV distinct-count sketch (q60's operator). */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("MinK buffer keeps the k smallest DISTINCT values, merge-order independent") {
    val agg = new Sketches.MinK(4)
    val xs = Seq(9L, 3L, 3L, 7L, 1L, 5L, 1L, 8L, 2L)
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(direct) == Seq(1L, 2L, 3L, 5L))
    // any split + merge gives the same result (commutative, associative)
    for (cut <- 0 to xs.length) {
      val (l, r) = xs.splitAt(cut)
      val m1 = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val m2 = agg.merge(r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m1) == Seq(1L, 2L, 3L, 5L), s"cut $cut")
      assert(agg.finish(m2) == Seq(1L, 2L, 3L, 5L), s"cut $cut swapped")
    }
  }

  test("property: MinK equals sorted-distinct-take-k under random data, splits, and merge order") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val agg = new Sketches.MinK(6)
    val gen = Gen.listOfN(40, Gen.choose(-20L, 20L)) // small domain forces duplicates
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { xs =>
        val expected = xs.distinct.sorted.take(6)
        val cut = i % (xs.length + 1)
        val (l, r) = xs.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) == expected, s"seed $i cut $cut")
      }
    }
  }

  test("fewer than k distinct values: sketch IS the exact distinct set") {
    import spark.implicits._
    val df = Seq(("g", "a"), ("g", "b"), ("g", "a")).toDF("grp", "v")
    val r = Sketches.kmvDistinct(df, "grp", col("v"), k = 16).collect()(0)
    assert(r.getAs[Long]("n_exact") == 2L)
    assert(r.getAs[Long]("n_sketch") == 2L)
    assert(r.isNullAt(r.fieldIndex("kth_hash")))
    assert(r.getAs[Double]("est_distinct") == 2.0)
  }

  test("estimate within 15% of exact on 10k distinct items, k=256") {
    import spark.implicits._
    val df = (0 until 30000).map(i => ("g", s"item-${i % 10000}")).toDF("grp", "v")
    val r = Sketches.kmvDistinct(df, "grp", col("v"), k = 256).collect()(0)
    assert(r.getAs[Long]("n_exact") == 10000L)
    val est = r.getAs[Double]("est_distinct")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"est $est")
  }

  test("null items are skipped and a null group key is reported, not dropped") {
    import spark.implicits._
    val df = Seq(
      (Some("g"), Some("a")), (Some("g"), None), // null item: skipped like countDistinct
      (None, Some("x")), (None, Some("y")))      // null GROUP: must still be reported
      .toDF("grp", "v")
    val rows = Sketches.kmvDistinct(df, "grp", col("v"), k = 8)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_sketch")))).toMap
    assert(rows(Some("g")) == ((1L, 1L))) // the null item did not kill the udaf
    assert(rows(None) == ((2L, 2L)))      // null-safe join kept the null group
  }

  test("a group whose items are ALL null reports n_exact=0 (countDistinct semantics)") {
    import spark.implicits._
    val df = Seq((("g1"), Option.empty[String]), ("g2", Some("a"))).toDF("grp", "v")
    val rows = Sketches.kmvDistinct(df, "grp", col("v"), k = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_sketch"), r.getAs[Double]("est_distinct"))))
      .toMap
    assert(rows("g1") == ((0L, 0L, 0.0))) // group reported, empty sketch
    assert(rows("g2") == ((1L, 1L, 1.0)))
  }

  test("estimate is invariant under repartitioning (determinism contract)") {
    import spark.implicits._
    val df = (0 until 5000).map(i => ("g", s"x$i")).toDF("grp", "v")
    val a = Sketches.kmvDistinct(df.repartition(1), "grp", col("v"), 128).collect()(0)
    val b = Sketches.kmvDistinct(df.repartition(17), "grp", col("v"), 128).collect()(0)
    assert(a.getAs[Double]("est_distinct") == b.getAs[Double]("est_distinct"))
    assert(a.getAs[Long]("kth_hash") == b.getAs[Long]("kth_hash"))
  }
}
