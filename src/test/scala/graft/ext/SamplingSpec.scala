package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Deterministic-sampling units. The oracle-backed q45 checks the split
  * stats bit-exactly against DuckDB; these pin the PROPERTIES the design
  * exists for: assignment is a pure function of the id (repartition- and
  * run-invariant) and sample sets grow monotonically with the fraction. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => s"doc_$i").toDF("id")
  }

  test("groupSample: exactly k per group, deterministic under repartitioning") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1 to 50) yield (g, s"${g}_$i")).toDF("grp", "id")
    val s1 = Sampling.groupSample(df.repartition(1), "grp", "id", 7)
      .select(col("grp"), col("id")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val s2 = Sampling.groupSample(df.repartition(13), "grp", "id", 7)
      .select(col("grp"), col("id")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s1 == s2)
    assert(s1.count(_._1 == "a") == 7 && s1.count(_._1 == "b") == 7)
  }

  test("groupSample with k >= group size returns the whole group") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y")).toDF("grp", "id")
    assert(Sampling.groupSample(df, "grp", "id", 10).count() == 2)
  }

  test("split assignment is invariant under repartitioning") {
    val df = ids(500)
    val base = df.select(col("id"), Sampling.splitColumn(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val repart = df.repartition(17)
      .select(col("id"), Sampling.splitColumn(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(base == repart)
  }

  test("split fractions land near the requested percentages") {
    val counts = ids(2000)
      .groupBy(Sampling.splitColumn(col("id"), 80, 10).as("s"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
  }

  test("deterministicSample is monotone in the kept fraction") {
    import spark.implicits._
    val df = ids(1000)
    val one = Sampling.deterministicSample(df, "id", 1, 4).as[String].collect().toSet
    val two = Sampling.deterministicSample(df, "id", 2, 4).as[String].collect().toSet
    val all = Sampling.deterministicSample(df, "id", 4, 4).as[String].collect().toSet
    assert(one.subsetOf(two))
    assert(two.subsetOf(all))
    assert(all.size == 1000)
  }

  test("stratifiedSample keeps ~pct per group, 100% for unmapped groups") {
    import spark.implicits._
    val df = (1 to 400).map(i => (s"id_$i", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val kept = Sampling.stratifiedSample(df, "id", "grp", Map("a" -> 25))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("b") == 200L)                       // unmapped: all kept
    assert(math.abs(kept("a") - 50L) < 25)          // ~25% of 200
    // subset of the full data, deterministic
    val again = Sampling.stratifiedSample(df.repartition(7), "id", "grp", Map("a" -> 25))
      .select("id").as[String].collect().toSet
    val first = Sampling.stratifiedSample(df, "id", "grp", Map("a" -> 25))
      .select("id").as[String].collect().toSet
    assert(again == first)
  }

  test("upsample replicates by group weight with 0-based copy ids") {
    import spark.implicits._
    val df = Seq(("x", "hot"), ("y", "hot"), ("z", "cold")).toDF("id", "grp")
    val up = Sampling.upsample(df, "grp", Map("hot" -> 3))
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(up.count(_._1 == "x") == 3)
    assert(up.filter(_._1 == "x").map(_._2).sorted.toSeq == Seq(0, 1, 2))
    assert(up.count(_._1 == "z") == 1)
    assert(up.filter(_._1 == "z").map(_._2).toSeq == Seq(0))
  }

  test("upsample weight 0 excludes the group entirely") {
    import spark.implicits._
    val df = Seq(("x", "drop"), ("y", "keep")).toDF("id", "grp")
    val up = Sampling.upsample(df, "grp", Map("drop" -> 0))
      .select("id").as[String].collect().toSeq
    assert(up == Seq("y"))
  }

  test("every row lands in exactly one split") {
    val df = ids(300).select(Sampling.splitColumn(col("id"), 80, 10).as("s"))
    assert(df.where(!col("s").isin("train", "val", "test")).count() == 0L)
  }

  test("isqrt is the exact integer square root (perfect squares and off-by-one traps)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // adversarial values: n = s^2 - 1, s^2, s^2 + 1 for random s, plus
    // huge values where double sqrt rounding actually bites
    val ns = (Seq(0L, 1L, 2L, 3L, 4L) ++
      (1 to 200).flatMap { _ =>
        val s = math.abs(rnd.nextLong() % 2000000000L) + 1
        Seq(s * s - 1, s * s, s * s + 1)
      }).filter(_ >= 0)
    val got = ns.toDF("n").select(col("n"), Sampling.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("alphaMixturePlan: sqrt weights, ppm near 1e6, oversubscription iff target > tokens") {
    import spark.implicits._
    val docs = Seq.tabulate(300) { i =>
      val src = s"s${i % 3}"
      // s0 tiny, s1 medium, s2 big
      val words = (i % 3 + 1) * (i % 3 + 1) * 4
      (i.toLong, src, Seq.fill(words)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val plan = Sampling.alphaMixturePlan(docs, "text", "source", budgetTokens = 4000L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val wsum = plan.values.map(_.getAs[Long]("weight_ppm")).sum
    assert(wsum > 999000L && wsum <= 1000000L, s"ppm sum $wsum (floor-division slack only)")
    plan.values.foreach { r =>
      val t = r.getAs[Long]("tokens"); val w = r.getAs[Long]("w_sqrt")
      assert(w * w <= t && (w + 1) * (w + 1) > t, "w_sqrt must be isqrt(tokens)")
      assert(r.getAs[Boolean]("oversubscribed") ==
        (r.getAs[Long]("target_tokens") > t))
      assert(r.getAs[Long]("expected_tokens") <= t)
    }
    // smoothing upweights the small source relative to its raw share
    val small = plan("s0"); val big = plan("s2")
    val rawShare = small.getAs[Long]("tokens").toDouble /
      plan.values.map(_.getAs[Long]("tokens")).sum
    val smoothShare = small.getAs[Long]("weight_ppm").toDouble / 1000000.0
    assert(smoothShare > rawShare, "alpha=1/2 must upsample the small source")
    assert(big.getAs[Long]("weight_ppm") < (big.getAs[Long]("tokens").toDouble /
      plan.values.map(_.getAs[Long]("tokens")).sum * 1000000).toLong,
      "and damp the head source")
  }

  test("shardPlan: deterministic under repartition; seeds reshuffle; offsets are prefix sums") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    def runPlan(df: org.apache.spark.sql.DataFrame, seed: Int) =
      Sampling.shardPlan(df, "doc_id", "text", numShards = 4, seed = seed)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    val a = runPlan(docs, 1)
    val b = runPlan(docs.repartition(13), 1)
    assert(a == b, "assignment must not depend on physical partitioning")
    val c = runPlan(docs, 2)
    assert(a != c, "a new seed must produce a different epoch order")
    assert(a.keySet == c.keySet, "every doc assigned in every epoch")
    // per shard: positions are 1..n and tok_offset is the prefix sum
    a.groupBy(_._2._1).foreach { case (shard, rows) =>
      val ordered = rows.values.toSeq.sortBy(_._2)
      assert(ordered.map(_._2) == (1L to ordered.size), s"shard $shard positions")
      var off = 0L
      ordered.foreach { case (_, _, nTok, tokOff) =>
        assert(tokOff == off, s"shard $shard offset")
        off += nTok
      }
    }
  }
}
