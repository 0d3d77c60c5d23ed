package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // independent formulation: per-bit loop over BigInt-free longs
  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("zValue matches the independent bit-interleave, incl. masking out-of-range inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(_ =>
      (rnd.nextLong().abs % (1L << 20), rnd.nextLong().abs % (1L << 20)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == zRef(x & 1023L, y & 1023L, 10), s"($x,$y)")
    }
    // corner bits: full-width inputs at the max supported width
    val corners = Seq((0L, 0L), ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1),
      ((1L << 31) - 1, (1L << 31) - 1))
    val gc = corners.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 31).as("z"))
      .collect().map(_.getLong(0))
    assert(gc.toSeq == corners.map { case (x, y) => zRef(x, y, 31) })
  }

  test("z-order layout bounds BOTH dimensions per partition; single-column sort bounds one") {
    // uniform 128x128 grid: the worst case for single-column layouts
    // (every y-slice contains the full x domain)
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y")

    def spans(laid: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      laid.groupBy(spark_partition_id().as("p"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

    val zSpans = spans(Layout.zOrderLayout(df, col("x"), col("y"), 7, 16))
    val ySpans = spans(df.repartitionByRange(16, col("y")).sortWithinPartitions(col("y")))

    assert(zSpans.size == 16 && ySpans.size == 16)
    // y-sorted layout: every partition covers the ENTIRE x domain — an
    // x-predicate prunes nothing
    assert(ySpans.forall(_._1 == 127L))
    // z-order: partitions are bounded rectangles in BOTH dimensions (16
    // even partitions = 32x32 quadrants). Range-boundary sampling can
    // straddle cell seams — a partition crossing the top-level quadrant
    // boundary legitimately spans one full dimension — so the claim is
    // statistical: most partitions tight, both mean spans halved.
    val tight = zSpans.count { case (sx, sy) => sx <= 63L && sy <= 63L }
    assert(tight >= 12, s"most partitions must be tight rectangles: $zSpans")
    val meanX = zSpans.map(_._1).sum.toDouble / zSpans.size
    val meanY = zSpans.map(_._2).sum.toDouble / zSpans.size
    assert(meanX <= 64.0 && meanY <= 64.0, s"mean spans ($meanX, $meanY)")
  }
}
