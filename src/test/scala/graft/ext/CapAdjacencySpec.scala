package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.capAdjacency]] — the deterministic hub pre-step for the walk
  * tier. Pins: identity when maxDeg covers the true max degree (the cap
  * is a no-op exactly when it should be), the exact per-src cap with a
  * JVM md5 replica of the (portableHash, dst) ranking (engine-portable,
  * not Spark-session-dependent), independence across sources (adding
  * edges at another src never changes a hub's kept set), duplicate
  * collapse, and partitioning invariance. */
class CapAdjacencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cap(edges: Seq[(String, String)], maxDeg: Int): Set[(String, String)] =
    Graphs.capAdjacency(edges.toDF("src", "dst"), maxDeg)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  /** JVM replica of the ranking key: first 15 hex chars of md5, base 16. */
  private def rankJvm(src: String, dst: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$src:$dst".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("maxDeg >= true max degree: the output IS the distinct input") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(200)((s"s${rnd.nextInt(20)}", s"d${rnd.nextInt(30)}")).distinct
    val maxDeg = edges.groupBy(_._1).map(_._2.size).max
    assert(cap(edges, maxDeg) == edges.toSet)
    assert(cap(edges, maxDeg + 5) == edges.toSet)
  }

  test("a hub is capped to EXACTLY maxDeg neighbors — the JVM-ranked smallest") {
    val hub = (1 to 100).map(i => ("hub", s"n$i"))
    val other = Seq(("a", "b"), ("a", "c"))
    val got = cap(hub ++ other, 10)
    val expectedHub = hub.sortBy { case (s, d) => (rankJvm(s, d), d) }.take(10).toSet
    assert(got == expectedHub ++ other.toSet)
    assert(got.count(_._1 == "hub") == 10)
  }

  test("independence across sources: growing another src leaves a hub's kept set fixed") {
    val hub = (1 to 50).map(i => ("hub", s"n$i"))
    val before = cap(hub, 8).filter(_._1 == "hub")
    val grown = hub ++ (1 to 500).map(i => ("other", s"x$i"))
    val after = cap(grown, 8).filter(_._1 == "hub")
    assert(before == after)
  }

  test("duplicate edges collapse before ranking (no double slots)") {
    val edges = Seq(("h", "a"), ("h", "a"), ("h", "b"), ("h", "c"))
    val got = cap(edges, 2)
    assert(got.size == 2 && got.forall(_._1 == "h"))
    val expected = Seq(("h", "a"), ("h", "b"), ("h", "c"))
      .sortBy { case (s, d) => (rankJvm(s, d), d) }.take(2).toSet
    assert(got == expected)
  }

  test("partitioning invariance: repartitioned input gives the identical set") {
    val rnd = new scala.util.Random(53)
    val edges = Seq.fill(300)((s"p${rnd.nextInt(10)}", s"q${rnd.nextInt(60)}")).distinct
    val a = cap(edges, 7)
    val b = Graphs.capAdjacency(edges.toDF("src", "dst").repartition(13), 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }
}
