package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Completeness of the PassJoin-blocked Levenshtein self-join: the operator
  * claims the EXACT pair list (no LSH miss rate), so the reference is a
  * brute-force DP over all distinct-name pairs — a missing pair means the
  * segment blocking broke, a surplus pair means verification broke. */
class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val names = strs.filter(_.length >= d + 1).distinct
    (for {
      a <- names; b <- names if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  private def run(strs: Seq[String], d: Int): Set[(String, String, Int)] =
    EditDistance.levSimilarityJoin(strs.toDF("name"), "name", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2).toInt)).toSet

  test("part-name-shaped corpus matches brute force at d = 1, 2, 3") {
    val adj = Seq("red", "blue", "cold", "old", "hot", "big", "small", "dark")
    val noun = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    val strs = for { a <- adj; n <- noun } yield s"$a $n"
    for (d <- Seq(1, 2, 3)) assert(run(strs, d) == brute(strs, d), s"d=$d")
  }

  test("random mutated strings match brute force, duplicates collapse to counts") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcde"
    val base = Seq.fill(15)((1 to (4 + rnd.nextInt(8)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val strs = Seq.fill(120) {
      val s = base(rnd.nextInt(base.size)).toBuffer
      rnd.nextInt(3) match {
        case 0 if s.nonEmpty => s(rnd.nextInt(s.size)) = alpha(rnd.nextInt(alpha.length))
        case 1 => s.insert(rnd.nextInt(s.size + 1), alpha(rnd.nextInt(alpha.length)))
        case _ if s.size > 1 => s.remove(rnd.nextInt(s.size))
        case _ =>
      }
      s.mkString
    }
    for (d <- Seq(1, 2)) assert(run(strs, d) == brute(strs, d), s"d=$d")
    // counts: every duplicate of a name lands in its group count
    val withDups = strs ++ strs.take(10)
    val got = EditDistance.levSimilarityJoin(withDups.toDF("name"), "name", 1)
      .collect().map(r => (r.getString(0), (r.getLong(3), r.getLong(4)))).toMap
    val freq = withDups.filter(_.length >= 2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (a, (ca, _)) => assert(ca == freq(a)) }
  }
}
