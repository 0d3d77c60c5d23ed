package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalBetweenness]] — the tenth maintained form.
  * Contract: for ANY disjoint base/delta split, folding the delta into
  * the stored per-pair dependency trace equals the one-shot
  * [[Graphs.betweennessCentrality]] over the union graph with the same
  * seeds. Coverage map (the incremental-family house pattern): random
  * waves incl. CHAINED waves (≡ batch), ball-boundary POISON
  * pass-through (a seed outside the reverse (R−1)-ball of the delta
  * srcs is provably not recomputed), the σ-only case (a delta adds a
  * PARALLEL shortest path — no level moves, path counts and the whole
  * dependency ladder still change), and the dag-cycle twin. Globality
  * audit: betweenness is a plain per-seed sum — no 1/N, no max-rescale
  * — so unlike PR/HITS there is no global knob for a poison to leak
  * through; the ball-boundary case IS the globality case. */
class IncrementalBetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(edges: Seq[(String, String)]) = edges.toDF("src", "dst")

  private def rollup(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def sym(e: Seq[(String, String)]): Seq[(String, String)] =
    (e ++ e.map(_.swap)).distinct

  test("random waves, chained: maintained trace equals the one-shot batch rollup") {
    for (seedVal <- Seq(13, 41)) {
      val rnd = new scala.util.Random(seedVal)
      val all = sym(Seq.fill(90)((s"n${rnd.nextInt(16)}", s"n${rnd.nextInt(16)}"))
        .filter(e => e._1 != e._2).distinct)
      // three chained waves: 60% base, then two 20% deltas
      val tagged = all.map(e => e -> rnd.nextInt(5))
      val base = tagged.filter(_._2 < 3).map(_._1)
      val wave1 = tagged.filter(_._2 == 3).map(_._1)
      val wave2 = tagged.filter(_._2 == 4).map(_._1)
      val seeds = Seq("n0", "n3", "n7").toDF("seed")
      var trace = Graphs.betweennessTrace(frame(base), seeds, rounds = 4)
      trace = Graphs.incrementalBetweennessTrace(
        trace, frame(base), frame(wave1), seeds, rounds = 4)
      val afterW1 = rollup(Graphs.betweennessCentrality(
        frame(base ++ wave1), seeds, rounds = 4))
      assert(rollup(trace.groupBy(col("node"))
        .agg(org.apache.spark.sql.functions.sum(col("dd")).as("bc_ppm"),
          org.apache.spark.sql.functions.count(when(col("dd") > 0L, 1L))
            .as("n_seeds_through"))) == afterW1,
        s"seed $seedVal wave 1: maintained != batch")
      val out = rollup(Graphs.incrementalBetweenness(
        trace, frame(base ++ wave1), frame(wave2), seeds, rounds = 4))
      val batch = rollup(Graphs.betweennessCentrality(
        frame(base ++ wave1 ++ wave2), seeds, rounds = 4))
      assert(out == batch, s"seed $seedVal wave 2: maintained != batch")
    }
  }

  test("ball-boundary POISON: a seed outside the reverse ball passes through verbatim") {
    // two far components: A = path a0-a1-a2-a3 (seed a0), B = path
    // b0-b1-b2-b3 (seed b0); the delta edge lands deep in A — B's seed
    // cannot reach the delta src within R-1 hops, so its trace rows
    // must be carried verbatim, provably not recomputed
    val base = sym(Seq(("a0", "a1"), ("a1", "a2"), ("a2", "a3"),
      ("b0", "b1"), ("b1", "b2"), ("b2", "b3")))
    val delta = Seq(("a1", "a3"), ("a3", "a1"))
    val seeds = Seq("a0", "b0").toDF("seed")
    val trace = Graphs.betweennessTrace(frame(base), seeds, rounds = 3)
    val poisoned = trace.withColumn("dd",
      when(col("seed") === "b0", col("dd") + 777000000L).otherwise(col("dd")))
    val out = rollup(Graphs.incrementalBetweenness(
      poisoned, frame(base), frame(delta), seeds, rounds = 3))
    // B's rows carried the poison into the rollup -> recompute would erase it
    assert(out.keys.filter(_.startsWith("b"))
      .forall(n => out(n)._1 >= 777000000L || out(n)._1 == 0L),
      s"poison must survive on B: $out")
    assert(out.exists { case (n, (bc, _)) => n.startsWith("b") && bc >= 777000000L },
      "at least one B node carries the poison")
    // and A IS recomputed: equals poison-free batch on the union graph
    val batch = rollup(Graphs.betweennessCentrality(
      frame(base ++ delta), seeds, rounds = 3))
    for ((n, v) <- batch if n.startsWith("a"))
      assert(out(n) == v, s"A must be recomputed exactly: $n -> ${out(n)} vs $v")
  }

  test("sigma-only delta: a parallel shortest path changes no level but the whole ladder") {
    // diamond s -> x -> t and s -> y -> t, base missing (y, t): adding
    // it keeps every distance identical but doubles sigma(t), which
    // halves the per-predecessor dependency terms — a pure path-COUNT
    // maintenance case (the one a distance-only ball test would miss)
    val base = Seq(("s", "x"), ("s", "y"), ("x", "t"), ("t", "z"))
    val delta = Seq(("y", "t"))
    val seeds = Seq("s").toDF("seed")
    val trace = Graphs.betweennessTrace(frame(base), seeds, rounds = 3)
    val out = rollup(Graphs.incrementalBetweenness(
      trace, frame(base), frame(delta), seeds, rounds = 3))
    val batch = rollup(Graphs.betweennessCentrality(
      frame(base ++ delta), seeds, rounds = 3))
    assert(out == batch)
    // x's traffic drops from the base value once t splits across x and y
    val baseRoll = rollup(Graphs.betweennessCentrality(
      frame(base), seeds, rounds = 3))
    assert(out("x")._1 < baseRoll("x")._1,
      s"sigma doubling must halve x's dependency: ${out("x")} vs ${baseRoll("x")}")
  }

  test("dag-cycle twin: cyclic graphs maintain identically to batch") {
    val base = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
      ("c1", "d0"), ("d0", "d1"))
    val delta = Seq(("d1", "c0"), ("c2", "d1"))
    val seeds = Seq("c0", "c2").toDF("seed")
    val trace = Graphs.betweennessTrace(frame(base), seeds, rounds = 4)
    val out = rollup(Graphs.incrementalBetweenness(
      trace, frame(base), frame(delta), seeds, rounds = 4))
    val batch = rollup(Graphs.betweennessCentrality(
      frame(base ++ delta), seeds, rounds = 4))
    assert(out == batch)
    assert(out.nonEmpty)
  }

  test("isolated seed joined by a delta: the explicit seed set recovers it") {
    // seed q is isolated in the base graph (zero trace rows); a delta
    // edge connects it — deriving the seed universe from the trace
    // would silently drop q forever, which is why the operator takes
    // the seed set explicitly
    val base = sym(Seq(("p0", "p1"), ("p1", "p2")))
    val delta = sym(Seq(("q", "p0")))
    val seeds = Seq("p0", "q").toDF("seed")
    val trace = Graphs.betweennessTrace(frame(base), seeds, rounds = 3)
    assert(trace.where(col("seed") === "q").count() == 0L,
      "isolated seed must have no trace rows")
    val out = rollup(Graphs.incrementalBetweenness(
      trace, frame(base), frame(delta), seeds, rounds = 3))
    val batch = rollup(Graphs.betweennessCentrality(
      frame(base ++ delta), seeds, rounds = 3))
    assert(out == batch)
  }
}
