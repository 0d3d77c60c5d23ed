package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Sketches.bitmapDistinct]] — exact bounded-domain distinct via
  * bit_or word packing. Pins equality with countDistinct on random
  * multisets, the word-boundary ids (63/64 — bit 63 is the long's sign
  * bit, touched only by bit_or/bit_count), duplication invariance, and
  * the word-count readout. */
class BitmapDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]): Map[String, (Long, Long)] =
    Sketches.bitmapDistinct(rows.toDF("g", "id"), "g", col("id"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("random multisets: n_distinct equals countDistinct exactly") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val got = run(rows)
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> ((xs.map(_._2).distinct.size.toLong,
        xs.map(_._2 / 64).distinct.size.toLong))
    }
    assert(got == want)
  }

  test("word boundary and sign bit: ids 63 and 64 land in different words; 63 uses bit 63") {
    val got = run(Seq(("a", 63L), ("a", 64L), ("a", 63L), ("a", 0L)))
    assert(got("a") == ((3L, 2L)))
  }

  test("negative id fails loudly (raise_error), not silently wrong") {
    // Unguarded, id = -1 would give `id % 64` = -1 (negative shift
    // count into shiftleft) and a floored `id div 64` word — silently
    // wrong counts. The domain contract is enforced instead.
    val ex = intercept[Exception] { run(Seq(("a", 3L), ("a", -1L))) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("negative id"))
  }

  test("duplication and partitioning invariance: bit_or is idempotent") {
    val rows = Seq.fill(50)(("x", 7L)) ++ Seq(("x", 8L))
    assert(run(rows) == Map("x" -> ((2L, 1L))))
    val df = rows.toDF("g", "id").repartition(13)
    val viaRepart = Sketches.bitmapDistinct(df, "g", col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaRepart == Set(("x", 2L, 1L)))
  }
}
