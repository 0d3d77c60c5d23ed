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
}
