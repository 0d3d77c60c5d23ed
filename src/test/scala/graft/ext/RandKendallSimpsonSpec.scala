package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.randIndex]], [[Evaluation.kendallTauA]], and
  * [[Evaluation.simpsonDiversity]] — the r13 agreement/concordance/
  * concentration readouts. Hand cases, JVM brute-force replicas, and
  * every loud guard. */
class RandKendallSimpsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ri(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): (Long, Long) = {
    val r = Graphs.randIndex(a.toDF("node", "la"), b.toDF("node", "lb"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("rand index: identical partitions score exactly 1e6") {
    val labs = Seq(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L, 5L -> 30L)
    assert(ri(labs, labs.map { case (n, l) => (n, l + 7) }) == ((5L, 1000000L)))
  }

  test("rand index: hand case and a brute-force pair replica") {
    val a = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 3L)
    val b = Seq(1L -> 9L, 2L -> 9L, 3L -> 8L, 4L -> 8L, 5L -> 7L, 6L -> 7L)
    val la = a.toMap
    val lb = b.toMap
    val nodes = la.keys.toSeq.sorted
    val pairs = for (i <- nodes; j <- nodes if i < j) yield (i, j)
    val agree = pairs.count { case (i, j) =>
      (la(i) == la(j)) == (lb(i) == lb(j)) }
    val expected = BigInt(agree) * 1000000 / pairs.size
    assert(ri(a, b) == ((6L, expected.toLong)))
  }

  test("rand index: node-set mismatch and single-node inputs fail loudly") {
    val a = Seq(1L -> 1L, 2L -> 1L)
    intercept[IllegalArgumentException] {
      Graphs.randIndex(a.toDF("node", "la"),
        Seq(1L -> 1L, 3L -> 1L).toDF("node", "lb"))
    }
    intercept[IllegalArgumentException] {
      Graphs.randIndex(Seq(1L -> 1L).toDF("node", "la"),
        Seq(1L -> 2L).toDF("node", "lb"))
    }
  }

  private def tau(rows: Seq[(Long, Long, Long)]): (Long, Long, Long) = {
    val r = Evaluation.kendallTauA(rows.toDF("id", "x", "y")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("kendall tau-a: perfect concordance, perfect reversal, and ties") {
    val up = (1L to 6L).map(i => (i, i, i * 10))
    assert(tau(up) == ((6L, 15L, 1000000L)))
    val down = (1L to 6L).map(i => (i, i, -10L * i))
    assert(tau(down) == ((6L, -15L, -1000000L)))
    // a tie in either signal zeroes that pair's contribution
    val tied = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 9L))
    // pairs: (1,2): y tied -> 0; (1,3): +1; (2,3): +1 -> s=2, n2=3
    assert(tau(tied) == ((3L, 2L, (BigInt(2 + 3) * 1000000 / 3 - 1000000).toLong)))
  }

  test("kendall tau-a: random rows equal a JVM brute force; n < 2 raises") {
    val rnd = new scala.util.Random(109)
    val rows = (1L to 40L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val s = (for {
      i <- rows.indices; j <- rows.indices if i < j
      si = java.lang.Long.signum(rows(i)._2 - rows(j)._2)
      sj = java.lang.Long.signum(rows(i)._3 - rows(j)._3)
    } yield (si * sj).toLong).sum
    val n2 = 40L * 39L / 2L
    val expected = ((BigInt(s) + n2) * 1000000 / n2 - 1000000).toLong
    assert(tau(rows) == ((40L, s, expected)))
    intercept[IllegalArgumentException] {
      Evaluation.kendallTauA(Seq((1L, 1L, 1L)).toDF("id", "x", "y"))
    }
  }

  private def simpson(rows: Seq[(String, String)]): Map[String, (Long, Long, Long)] =
    Evaluation.simpsonDiversity(rows.toDF("g", "c"), "g", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("simpson diversity: single category 0, uniform k categories 1e6 - 1e6/k") {
    val rows = Seq.fill(7)(("mono", "en")) ++
      (0 until 12).map(i => ("quad", s"l${i % 4}"))
    val got = simpson(rows)
    assert(got("mono") == ((7L, 1L, 0L)))
    // uniform over 4: 1e6 - (4 * 9 * 1e6) div 144 = 1e6 - 250000
    assert(got("quad") == ((12L, 4L, 750000L)))
  }

  test("simpson diversity: random rows equal a JVM replica") {
    val rnd = new scala.util.Random(113)
    val rows = Seq.fill(300)((s"g${rnd.nextInt(4)}", s"c${rnd.nextInt(6)}"))
    val expected = rows.groupBy(_._1).map { case (g, xs) =>
      val counts = xs.groupBy(_._2).map(_._2.size.toLong)
      val n = xs.size.toLong
      val c2 = counts.map(c => BigInt(c) * c).sum
      g -> ((n, counts.size.toLong,
        (1000000 - c2 * 1000000 / (BigInt(n) * n)).toLong))
    }
    assert(simpson(rows) == expected)
  }
}
