package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.hyperAnf]] — the register-semantics pins behind the q367
  * oracle: (1) after t rounds a node's register set is EXACTLY the HLL
  * registers of its true t-ball (brute-force BFS + JVM md5 replica);
  * (2) the linear-counting table is what the doc claims; (3) complete
  * graphs converge in one round and the curve is monotone. */
class HyperAnfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** JVM replica of Sampling.portableHash(string). */
  private def pHash(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def rho(h: Long): Int = {
    val v = h >>> 6
    if (v == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(v))
  }

  /** Exact t-ball register table: node -> bucket -> max rho. */
  private def ballRegs(edges: Seq[(String, String)], t: Int): Map[String, Map[Long, Int]] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    nodes.map { v =>
      var ball = Set(v)
      (1 to t).foreach(_ => ball = ball ++ ball.flatMap(adj.getOrElse(_, Set.empty)))
      v -> ball.toSeq.map(pHash).groupBy(_ % 64)
        .view.mapValues(_.map(rho).max).toMap
    }.toMap
  }

  private val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), // path
    ("c", "f"), ("f", "g"), // branch
    ("x", "y"), // separate component
  )

  test("registers after t rounds ≡ HLL registers of the exact t-ball (t = 1..3)") {
    // re-derive the internal register frame by running hyperAnf's public
    // readout inputs: recompute regs via the operator's own construction
    // is private, so pin the OBSERVABLE sum instead: per-node est_milli
    // from ball registers must reproduce the operator's per-round output
    (1 to 3).foreach { t =>
      val want = ballRegs(edges, t)
      val linTable: Map[Int, Long] = Graphs.hyperAnfLinMilli.toMap
      val estSum: Long = want.values.map { regs =>
        val vZero = 64 - regs.size
        if (vZero > 0) linTable(vZero)
        else {
          val sSum = regs.values.map(m => 1L << (55 - m)).sum
          math.floor(1000.0 * (0.709 * 4096.0 * 3.6028797018963968e16 / sSum)).toLong
        }
      }.sum
      val row = Graphs.hyperAnf(edges.toDF("a", "b"), rounds = 3)
        .where(col("t") === t).head
      assert(row.getLong(1) == want.size.toLong, s"t=$t n_nodes")
      assert(row.getLong(3) == estSum, s"t=$t sum_est_milli")
    }
  }

  test("linear-counting table: floor(1000 * 64 * ln(64/V)); singleton ball estimates ~1") {
    assert(Graphs.hyperAnfLinMilli.size == 64)
    Graphs.hyperAnfLinMilli.foreach { case (v, milli) =>
      assert(milli == math.floor(1000.0 * 64.0 * math.log(64.0 / v)).toLong)
    }
    // a 2-node component: after round 1 each ball = {self, other} -> the
    // V=62 linear estimate (2 occupied buckets assuming no collision)
    val twoBall = ballRegs(Seq(("x", "y")), 1)("x")
    assert(twoBall.size == 2) // the md5s of "x","y" land in distinct buckets
    val linTable: Map[Int, Long] = Graphs.hyperAnfLinMilli.toMap
    assert(linTable(62) == math.floor(1000.0 * 64.0 * math.log(64.0 / 62)).toLong)
  }

  test("complete graph K6 converges at t = 1; curve is monotone nondecreasing") {
    val k6 = for (i <- 0 until 6; j <- i + 1 until 6) yield (s"n$i", s"n$j")
    val out = Graphs.hyperAnf(k6.toDF("a", "b"), rounds = 3)
      .orderBy(col("t")).collect()
    assert(out(0).getLong(3) == out(1).getLong(3) &&
      out(1).getLong(3) == out(2).getLong(3), "K6 did not converge at t=1")
    val path = Graphs.hyperAnf(edges.toDF("a", "b"), rounds = 3)
      .orderBy(col("t")).collect()
    assert(path(0).getLong(3) <= path(1).getLong(3) &&
      path(1).getLong(3) <= path(2).getLong(3), "curve not monotone")
  }
}
