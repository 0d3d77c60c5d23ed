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

  // --- Count-Min sketch (q82's operator) ---

  test("CMS: estimate >= exact for EVERY item (one-sided error guarantee)") {
    import spark.implicits._
    // zipf-ish multiset with heavy collisions: width 16 << 200 distinct
    val rows = (0 until 200).flatMap(i => Seq.fill(1 + (i % 7))(s"tok$i")).toDF("item")
    val counters = Sketches.cmsCounters(rows, col("item"), 4, 16)
    val exact = rows.groupBy("item").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(exact.select("item"), counters, "item", 4, 16)
    val joined = est.join(exact, "item")
      .select(col("item"), col("cms_est"), col("n")).collect()
    assert(joined.length == 200)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2), r.toString))
  }

  test("CMS: counter table is bounded by depth x width and sums to depth x rows") {
    import spark.implicits._
    val rows = (0 until 1000).map(i => s"t${i % 300}").toDF("item")
    val counters = Sketches.cmsCounters(rows, col("item"), 4, 16).collect()
    assert(counters.length <= 4 * 16)
    assert(counters.map(_.getAs[Long]("c")).sum == 4L * 1000)
  }

  test("CMS: estimates invariant under repartitioning; unseen item probes its collision floor") {
    import spark.implicits._
    val data = (0 until 500).map(i => s"w${i % 50}")
    val a = Sketches.cmsEstimate(
      Seq("w0", "w7").toDF("item"),
      Sketches.cmsCounters(data.toDF("item").repartition(1), col("item"), 4, 64), "item", 4, 64)
      .orderBy("item").collect().map(_.getLong(1)).toSeq
    val b = Sketches.cmsEstimate(
      Seq("w0", "w7").toDF("item"),
      Sketches.cmsCounters(data.toDF("item").repartition(13), col("item"), 4, 64), "item", 4, 64)
      .orderBy("item").collect().map(_.getLong(1)).toSeq
    assert(a == b && a.forall(_ >= 10L)) // every w% key appears 10x
    // an item never inserted can only read collision mass (>= 0, never negative)
    val unseen = Sketches.cmsEstimate(
      Seq("never-seen").toDF("item"),
      Sketches.cmsCounters(data.toDF("item"), col("item"), 4, 64), "item", 4, 64)
      .collect()(0).getLong(1)
    assert(unseen >= 0L)
  }

  // --- Misra-Gries frequent items (q98's operator) ---

  /** Asserts G1-G3 for a summary against the true frequency map. */
  private def assertMgGuarantees(buf: FreqBuf, truth: Map[String, Long],
      k: Int, ctx: String): Unit = {
    val n = truth.values.sum
    assert(buf.n == n, s"$ctx: n")
    assert(buf.counts.size <= k, s"$ctx: size")
    val s = buf.counts.values.sum
    val bound = (n - s).toDouble / (k + 1)
    buf.counts.foreach { case (x, c) =>
      val f = truth.getOrElse(x, 0L)
      assert(c <= f, s"$ctx: G1 over-count on $x ($c > $f)") // G1
      assert(f - c <= bound, s"$ctx: G2 error on $x")        // G2
    }
    truth.foreach { case (x, f) => // G3: heavy item must be tracked
      if (f * (k + 1L) > n)
        assert(buf.counts.contains(x), s"$ctx: G3 missing heavy $x")
    }
  }

  test("property: Misra-Gries G1/G2/G3 hold under random streams, splits, and merge order") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 4
    val agg = new Sketches.FreqItems(k)
    // zipf-ish small domain: item i drawn with weight ~ 1/(i+1)
    val itemGen = Gen.frequency((1 to 12).map(i => (13 - i, Gen.const(s"t$i"))): _*)
    val gen = Gen.listOfN(120, itemGen)
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { xs =>
        val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val direct = xs.foldLeft(agg.zero)(agg.reduce)
        assertMgGuarantees(direct, truth, k, s"seed $i direct")
        // split at a rotating cut, merge both ways — guarantees must survive
        val cut = i % (xs.length + 1)
        val (l, r) = xs.splitAt(cut)
        val lb = l.foldLeft(agg.zero)(agg.reduce)
        val rb = r.foldLeft(agg.zero)(agg.reduce)
        assertMgGuarantees(agg.merge(lb, rb), truth, k, s"seed $i merge")
        assertMgGuarantees(agg.merge(rb, lb), truth, k, s"seed $i merge-swap")
      }
    }
  }

  test("Misra-Gries multiway merge keeps guarantees (simulates many partitions)") {
    val k = 8
    val agg = new Sketches.FreqItems(k)
    val xs = (0 until 5000).map(i => s"w${i % (if (i % 3 == 0) 5 else 400)}")
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merged = xs.grouped(137)
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assertMgGuarantees(merged, truth, k, "multiway")
  }

  test("guaranteedHeavyHitters = exact {x : f(x)*(k+1) > n}, invariant under repartitioning") {
    import spark.implicits._
    // 3 heavy items (400/3000 = 2/15 share each, strictly > 1/9) in a
    // 200-item tail
    val rows = ((0 until 1200).map(_ % 3).map(i => s"heavy$i") ++
      (0 until 1800).map(i => s"tail${i % 200}")).toDF("item")
    val k = 8
    val expected = rows.groupBy("item").count()
      .where(col("count") * (k + 1) > lit(3000L))
      .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (parts <- Seq(1, 13)) {
      val got = Sketches.guaranteedHeavyHitters(rows.repartition(parts), col("item"), k)
        .orderBy("item").collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_exact"))).toSeq
      assert(got == expected, s"parts=$parts")
      assert(got.map(_._1) == Seq("heavy0", "heavy1", "heavy2"))
    }
  }

  test("guaranteedHeavyHitters: empty result when nothing exceeds n/(k+1)") {
    import spark.implicits._
    val rows = (0 until 1000).map(i => s"u$i").toDF("item") // all-distinct stream
    assert(Sketches.guaranteedHeavyHitters(rows, col("item"), 8).count() == 0L)
  }

  test("HLL: registers are a pure set function — duplication and repartitioning change nothing") {
    import spark.implicits._
    val base = (0 until 500).map(i => ("g", s"item-$i"))
    val dup = (base ++ base ++ base).toDF("grp", "v").repartition(13)
    val one = base.toDF("grp", "v").repartition(3)
    val a = Sketches.hllRegisters(one, col("grp"), col("v"))
      .orderBy("grp", "bucket").collect().toSeq
    val b = Sketches.hllRegisters(dup, col("grp"), col("v"))
      .orderBy("grp", "bucket").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("HLL: __all__ rollup register equals the sketch built over the union (lossless merge)") {
    import spark.implicits._
    val df = (0 until 400).map(i => (s"g${i % 3}", s"x-$i")).toDF("grp", "v")
    val merged = Sketches.hllDistinct(df, "grp", col("v"))
      .where(col("grp") === "__all__").collect()(0)
    val direct = Sketches.hllDistinct(df.withColumn("grp", lit("g")), "grp", col("v"))
      .where(col("grp") === "g").collect()(0)
    for (f <- Seq("v_zero", "s_sum"))
      assert(merged.getAs[Long](f) == direct.getAs[Long](f), f)
    assert(merged.getAs[Double]("raw_est") == direct.getAs[Double]("raw_est"))
  }

  test("HLL: raw-regime estimate within 30% at m=64 (stderr ~13%); small groups report NULL") {
    import spark.implicits._
    val df = ((0 until 20000).map(i => ("big", s"d-${i % 5000}")) ++
      (0 until 40).map(i => ("tiny", s"t-${i % 10}"))).toDF("grp", "v")
    val rows = Sketches.hllDistinct(df, "grp", col("v")).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val big = rows("big")
    assert(big.getAs[Long]("v_zero") == 0L)
    val est = big.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.30, s"est $est")
    val tiny = rows("tiny")
    assert(tiny.getAs[Long]("v_zero") > 0L)
    assert(tiny.isNullAt(tiny.fieldIndex("est_distinct")))
    assert(tiny.getAs[Long]("n_exact") == 10L)
  }

  test("HLL: rho matches a JVM reference on the hash split") {
    import spark.implicits._
    val hs = Seq(0L, 1L, 63L, 64L, 65L, 1L << 59, (1L << 60) - 1, 12345678901L)
    val got = hs.toDF("h").select(col("h"), Sketches.hllRho(col("h")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hs.foreach { h =>
      val v = h >>> 6
      val expected = if (v == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      assert(got(h) == expected, s"h=$h")
      assert(Sketches.hllRhoJvm(h) == expected, s"JVM mirror h=$h")
    }
  }

  test("cmsJoinSizeEstimate: every depth row overestimates; min is tight at low load") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(2000)(rnd.nextInt(300).toLong).toDF("k")
    val b = Seq.fill(3000)(rnd.nextInt(300).toLong).toDF("k")
    val exact = a.join(b, "k").count()
    val est = Sketches.cmsJoinSizeEstimate(a, col("k"), b, col("k"),
        depth = 4, width = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(est.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    est.foreach { case (j, e, m) =>
      assert(e >= exact, s"row $j must overestimate (cross terms are non-negative)")
      assert(m == est.map(_._2).min, "est_min is the row minimum")
    }
    // 300 keys in 4096 buckets: collision bias is a few percent, not integer factors
    assert(est.map(_._2).min < exact * 2, "estimate informative at this load factor")
  }

  test("kmvIntersection: exact (err 0) below k; informative with full sketches") {
    import spark.implicits._
    // 3 groups over a 0..59 item universe with known overlaps
    val items = ((0 until 40).map(i => ("a", i.toLong)) ++
      (20 until 60).map(i => ("b", i.toLong)) ++
      (0 until 60 by 2).map(i => ("c", i.toLong)) ++
      (0 until 40).map(i => ("a", i.toLong))) // dup rows must not matter
      .toDF("g", "item")

    // k above every group's cardinality: theta = 2^60, estimate EXACT
    val below = Sketches.kmvIntersection(items, "g", col("item"), k = 128)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(below(("a", "b")) == ((20000L, 20L, 0L)))
    assert(below(("a", "c")) == ((20000L, 20L, 0L)))
    assert(below(("b", "c")) == ((20000L, 20L, 0L)))

    // k below the cardinalities: sketch path — estimate within 2x on this
    // tiny universe and the err_ppm column is the realized |est-exact| rate
    val full = Sketches.kmvIntersection(items, "g", col("item"), k = 16)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    full.foreach { case (pair, (estMilli, exact, errPpm)) =>
      assert(exact == 20L, s"$pair exact")
      assert(estMilli >= 0L && estMilli / 1000 <= 60, s"$pair estimate bounded by universe")
      assert(errPpm == math.abs(estMilli / 1000 - exact) * 1000000 / exact, s"$pair audit")
    }
  }
}
