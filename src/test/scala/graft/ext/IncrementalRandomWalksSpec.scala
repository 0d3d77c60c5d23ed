package graft.ext

import org.apache.spark.sql.functions.{col, concat, lit, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalRandomWalks]] — the walk-corpus maintained form.
  * Contract: folding an additive edge wave into the stored corpus
  * equals re-running [[Graphs.randomWalks]] on the union graph.
  * Coverage map (the incremental-family house pattern): random waves
  * (≡ batch, chained), POISON pass-through (an untouched origin's rows
  * are provably carried verbatim), the sink-unsinking case (a
  * truncated walk whose terminal node gains out-edges IS touched and
  * resumes), and the adjacency-side precision case (a delta edge's DST
  * standing alone does not touch a walk — only SRC adjacency feeds the
  * hop rule). */
class IncrementalRandomWalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpusOf(df: org.apache.spark.sql.DataFrame)
      : Set[(String, Long, Long, String)] =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  private def sym(e: Seq[(String, String)]): Seq[(String, String)] =
    (e ++ e.map(_.swap)).distinct

  test("random waves, chained: maintained corpus equals the one-shot batch corpus") {
    for (seedVal <- Seq(11, 37)) {
      val rnd = new scala.util.Random(seedVal)
      val all = sym(Seq.fill(80)((s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}"))
        .filter(e => e._1 != e._2).distinct)
      val tagged = all.map(e => e -> rnd.nextInt(5))
      val base = tagged.filter(_._2 < 3).map(_._1)
      val wave1 = tagged.filter(_._2 == 3).map(_._1)
      val wave2 = tagged.filter(_._2 == 4).map(_._1)
      val origins = all.map(_._1).distinct.toDF("origin")
      var corpus = Graphs.randomWalks(base.toDF("src", "dst"), origins, 2, 4)
      corpus = Graphs.incrementalRandomWalks(corpus,
        base.toDF("src", "dst"), wave1.toDF("src", "dst"), 2, 4)
      assert(corpusOf(corpus) == corpusOf(
        Graphs.randomWalks((base ++ wave1).toDF("src", "dst"), origins, 2, 4)),
        s"seed $seedVal wave 1")
      val out = Graphs.incrementalRandomWalks(corpus,
        (base ++ wave1).toDF("src", "dst"), wave2.toDF("src", "dst"), 2, 4)
      assert(corpusOf(out) == corpusOf(
        Graphs.randomWalks(all.toDF("src", "dst"), origins, 2, 4)),
        s"seed $seedVal wave 2")
    }
  }

  test("POISON: an untouched origin's corpus rows pass through verbatim") {
    // component A: cycle a0-a1-a2 (delta lands here); component B:
    // cycle b0-b1-b2, never touched — its rows must be carried, not
    // recomputed, proven by a poison sentinel surviving
    val base = sym(Seq(("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
      ("b0", "b1"), ("b1", "b2"), ("b2", "b0")))
    val delta = sym(Seq(("a0", "x")))
    val origins = Seq("a0", "b0").toDF("origin")
    val corpus = Graphs.randomWalks(base.toDF("src", "dst"), origins, 2, 3)
    val poisoned = corpus.withColumn("node",
      when(col("origin") === "b0", concat(col("node"), lit("!POISON")))
        .otherwise(col("node")))
    val out = corpusOf(Graphs.incrementalRandomWalks(poisoned,
      base.toDF("src", "dst"), delta.toDF("src", "dst"), 2, 3))
    assert(out.filter(_._1 == "b0").forall(_._4.endsWith("!POISON")),
      "untouched origin must be carried verbatim")
    // and the touched origin equals the poison-free batch on the union
    val batch = corpusOf(Graphs.randomWalks(
      (base ++ delta).toDF("src", "dst"), origins, 2, 3))
    assert(out.filter(_._1 == "a0") == batch.filter(_._1 == "a0"))
  }

  test("sink-unsinking: a truncated walk whose terminal node gains out-edges resumes") {
    // directed chain a -> b -> c; every walk from a truncates at c
    val base = Seq(("a", "b"), ("b", "c"))
    val delta = Seq(("c", "d"), ("d", "e"))
    val origins = Seq("a").toDF("origin")
    val corpus = Graphs.randomWalks(base.toDF("src", "dst"), origins, 1, 4)
    assert(corpusOf(corpus).map(_._3).max == 2L, "walk truncates at the sink")
    val out = corpusOf(Graphs.incrementalRandomWalks(corpus,
      base.toDF("src", "dst"), delta.toDF("src", "dst"), 1, 4))
    assert(out == corpusOf(Graphs.randomWalks(
      (base ++ delta).toDF("src", "dst"), origins, 1, 4)))
    assert(out.map(_._3).max == 4L, "the un-sunk walk must run full length")
  }

  test("dst-only precision: a delta edge INTO a visited node touches nothing") {
    // walks stand on a, b, c; the delta edge x -> b changes only x's
    // out-adjacency (never hopped from), so the whole corpus passes
    // through — pinned with a poison on EVERY row
    val base = sym(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    val delta = Seq(("x", "b")) // directed: only x's adjacency changes
    val origins = Seq("a", "b").toDF("origin")
    val corpus = Graphs.randomWalks(base.toDF("src", "dst"), origins, 2, 3)
    val poisoned = corpus.withColumn("node", concat(col("node"), lit("#P")))
    val out = corpusOf(Graphs.incrementalRandomWalks(poisoned,
      base.toDF("src", "dst"), delta.toDF("src", "dst"), 2, 3))
    assert(out.nonEmpty && out.forall(_._4.endsWith("#P")),
      "no walk visits x, so every stored row must be carried verbatim")
  }
}
