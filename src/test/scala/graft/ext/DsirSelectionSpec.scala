package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Sampling.dsirSelection]] — DSIR hashed-unigram importance weights in
  * quarter-bit integer log2. Pins the weights against a full JVM replica
  * (portable hash → bucket counts → Laplace-smoothed quarterLog2 ratio),
  * the ranking direction (target-like docs outrank pool-like docs), the
  * selection boundary + tie order, and the degenerate empty-target case
  * (smoothing keeps every term defined). */
class DsirSelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 16

  private def hash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Full JVM replica of the operator's math. */
  private def replica(docs: Seq[(Long, String, Boolean)], take: Int)
      : Map[Long, (Long, Long, Boolean)] = {
    val toks = docs.flatMap { case (id, text, t) =>
      text.split(" ").map(w => (id, t, hash60(w) % B))
    }
    val cntT = toks.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val cntR = toks.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val nt = cntT.values.sum
    val nr = cntR.values.sum
    val q4 = TextAnalysis.quarterLog2Jvm _
    val term = cntR.keys.map { b =>
      b -> (q4((cntT.getOrElse(b, 0L) + 1) * (nr + B)) - q4((cntR(b) + 1) * (nt + B)))
    }.toMap
    val perDoc = toks.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.size.toLong, xs.map(x => term(x._3)).sum))
    }
    val sel = perDoc.toSeq.sortBy { case (id, (_, w)) => (-w, id) }
      .take(take).map(_._1).toSet
    perDoc.map { case (id, (n, w)) => id -> ((n, w, sel.contains(id))) }
  }

  private def run(docs: Seq[(Long, String, Boolean)], take: Int)
      : Map[Long, (Long, Long, Boolean)] =
    Sampling.dsirSelection(
        docs.toDF("doc_id", "text", "is_t"), "text", "doc_id",
        col("is_t"), buckets = B, take = take)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("weights and selection equal the JVM replica on a random corpus") {
    val rnd = new scala.util.Random(41)
    val vocabT = (0 until 8).map(i => s"tgt$i")
    val vocabR = (0 until 12).map(i => s"raw$i")
    val docs = (0L until 30L).map { id =>
      val target = id % 3 == 0
      val pool = if (target) vocabT ++ vocabR.take(3) else vocabR
      val text = Seq.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")
      (id, text, target)
    }
    assert(run(docs, take = 7) == replica(docs, take = 7))
  }

  test("a doc of target-exclusive tokens outranks a doc of pool-common tokens") {
    // zeta/omega land in DIFFERENT hash buckets at B=16 (alpha/beta collide)
    val docs = Seq(
      (1L, "zeta zeta zeta zeta", true),
      (2L, "omega omega omega omega", false),
      (3L, "zeta zeta zeta zeta", false), // target-like but unlabeled
      (4L, "omega omega omega omega", false))
    val out = run(docs, take = 2)
    assert(out(1L)._3 && out(3L)._3, "target-like docs selected")
    assert(!out(2L)._3 && !out(4L)._3)
    assert(out(1L)._2 > out(2L)._2, "target tokens carry higher weight")
    assert(out(1L)._2 == out(3L)._2, "weight is content-only, label-free")
  }

  test("equal-weight ties at the boundary break by ascending id") {
    val docs = Seq((5L, "x x", false), (3L, "x x", false), (9L, "x x", false))
    val out = run(docs, take = 2)
    assert(out(3L)._3 && out(5L)._3 && !out(9L)._3)
  }

  test("empty target slice: smoothing keeps weights defined; take still fills") {
    val docs = Seq((1L, "a b c", false), (2L, "d e f", false))
    val out = run(docs, take = 1)
    assert(out.size == 2 && out.values.count(_._3) == 1)
    assert(out == replica(docs, take = 1))
  }
}
