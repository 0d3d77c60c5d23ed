package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HistogramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent single-pass reference: exact bin from scaled floor, then a
    * linear scan for the ceil-rank pick. */
  private def ref(values: Seq[Double], scale: Int, p: Int): Double = {
    val bins = values.groupBy(v => math.floor(v * scale).toLong)
      .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = values.size.toLong
    val target = (n * p + 99) / 100
    var cum = 0L
    for ((bin, cnt) <- bins) {
      cum += cnt
      if (cum >= target) return bin / scale.toDouble
    }
    Double.NaN
  }

  test("gridQuantiles matches the independent reference on random data") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(4000) { i =>
      (s"g${i % 3}", rnd.nextDouble() * 500 - 100) // negatives included
    }
    val got = Histogram.gridQuantiles(rows.toDF("g", "v"), col("g"), col("v"),
        16, Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    for (g <- Seq("g0", "g1", "g2")) {
      val vs = rows.filter(_._1 == g).map(_._2)
      val (n, p50, p90, p99) = got(g)
      assert(n == vs.size)
      assert(p50 == ref(vs, 16, 50), s"$g p50")
      assert(p90 == ref(vs, 16, 90), s"$g p90")
      assert(p99 == ref(vs, 16, 99), s"$g p99")
    }
  }

  test("quantile error is bounded by the grid pitch; results repartition-invariant") {
    val vs = Seq.tabulate(977)(i => (i * 37 % 977) * 0.251)
    val df = vs.map(("k", _)).toDF("g", "v")
    val q50 = Histogram.gridQuantiles(df, col("g"), col("v"), 64, Seq(50))
      .collect().head.getDouble(2)
    val exact = vs.sorted.apply((vs.size + 1) / 2 - 1) // ceil-rank exact median
    assert(math.abs(q50 - exact) <= 1.0 / 64, s"pitch bound: $q50 vs $exact")

    val a = Histogram.gridQuantiles(df.repartition(13), col("g"), col("v"), 64,
      Seq(50, 99)).collect().map(_.toSeq).toSeq
    val b = Histogram.gridQuantiles(df.repartition(2), col("g"), col("v"), 64,
      Seq(50, 99)).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ksDrift matches the independent reference and ranks the planted drifter first") {
    val rnd = new scala.util.Random(31)
    // g0/g1 same distribution, g2 shifted — drift must rank g2 highest
    val rows = Seq.tabulate(3000) { i =>
      val g = i % 3
      val v = if (g == 2) rnd.nextDouble() * 40 + 12 else rnd.nextDouble() * 40
      (s"g$g", v)
    }
    val got = Histogram.ksDrift(rows.toDF("g", "v"), col("g"), col("v"), 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

    // independent reference on the union of occupied bins
    val binned = rows.map { case (g, v) => (g, math.floor(v * 16).toLong) }
    val allBins = binned.map(_._2).distinct.sorted
    val perGrp = binned.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val nTot = rows.size.toLong
    for ((g, cnts) <- perGrp) {
      val nG = cnts.values.sum
      val nRest = nTot - nG
      var cumG = 0L; var cumAll = 0L; var best = 0L
      for (b <- allBins) {
        cumG += cnts.getOrElse(b, 0L)
        cumAll += perGrp.valuesIterator.map(_.getOrElse(b, 0L)).sum
        best = math.max(best, math.abs(cumG * nRest - (cumAll - cumG) * nG))
      }
      assert(got(g) == ((nG, best, best.toDouble / (nG * nRest))), s"group $g")
    }
    // g2 is the planted drifter; g0/g1's one-vs-rest KS is nonzero only
    // because g2 contaminates their "rest"
    assert(got("g2")._3 > 1.5 * got("g0")._3 && got("g2")._3 > 1.5 * got("g1")._3)
    assert(got("g2")._3 > 0.2)
  }

  test("weeklyKsDrift pairs consecutive weeks only; identical weeks score 0, a shifted week spikes") {
    val weekNs = 7L * 24 * 3600 * 1000000000L
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(400)(rnd.nextDouble() * 30)
    // weeks 0,1 identical; week 2 shifted; week 4 present but week 3 missing
    val rows =
      base.map(v => ("a", v, 0L * weekNs + 5)) ++
      base.map(v => ("a", v, 1L * weekNs + 5)) ++
      base.map(v => ("a", v + 9, 2L * weekNs + 5)) ++
      base.map(v => ("a", v, 4L * weekNs + 5))
    val got = Histogram.weeklyKsDrift(rows.toDF("g", "v", "ts"), col("g"),
        col("v"), "ts", 16)
      .collect().map(r => r.getLong(1) -> r.getDouble(5)).toMap
    assert(got.keySet == Set(1L, 2L), "only weeks with a previous week qualify")
    assert(got(1L) == 0.0, "identical consecutive weeks have zero drift")
    assert(got(2L) > 0.25, "the shifted week must spike")
  }

  test("power-of-two scaling is exact: bin ids agree with BigDecimal floor") {
    val rnd = new scala.util.Random(5)
    val vs = Seq.fill(500)(rnd.nextDouble() * 1e6 - 5e5)
    val got = Histogram.gridBins(vs.map(("k", _)).toDF("g", "v"), col("g"),
        col("v"), 16)
      .select(col("bin")).as[Long].collect().toSet
    val want = vs.map(v => new java.math.BigDecimal(v)
      .multiply(new java.math.BigDecimal(16))
      .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()).toSet
    assert(got == want)
  }
}
