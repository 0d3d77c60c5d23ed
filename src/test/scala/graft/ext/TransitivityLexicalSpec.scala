package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.globalTransitivity]] and [[TextAnalysis.lexicalDiversity]]
  * — r13 one-row/per-group readouts. Hand cases, JVM replicas, the
  * wedge-free loud failure. */
class TransitivityLexicalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def trans(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Graphs.globalTransitivity(edges.toDF("a", "b")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("triangle = 1e6; path = 0; a clique stays 1e6") {
    assert(trans(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((1L, 1000000L)))
    assert(trans(Seq((1L, 2L), (2L, 3L))) == ((0L, 0L)))
    val k4 = for (x <- 1L to 4L; y <- (x + 1) to 4L) yield (x, y)
    assert(trans(k4) == ((4L, 1000000L)))
  }

  test("triangle + pendant: 3 closed of 5 wedges") {
    // triangle {1,2,3} + edge (3,4): degs 2,2,3,1; wedges = 1+1+3 = 5;
    // transitivity = 3*1/5 = 600000
    val got = trans(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got == ((1L, 600000L)))
  }

  test("wedge-free graph (max degree 1) fails loudly") {
    val ex = intercept[Exception] { trans(Seq((1L, 2L), (3L, 4L))) }
    assert((ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse(""))
      .contains("no wedges"))
  }

  test("random graph equals a JVM replica") {
    val rnd = new scala.util.Random(127)
    val edges = Seq.fill(120)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    // unambiguous ground truth: enumerate ordered node triples
    val nodes = adj.keys.toSeq.sorted
    val tri = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      if adj(nodes(i)).contains(nodes(j)) && adj(nodes(i)).contains(nodes(k)) &&
        adj(nodes(j)).contains(nodes(k))
    } yield 1).size.toLong
    val w2 = adj.values.map(s => s.size.toLong * (s.size - 1)).sum
    val expected = (BigInt(6) * tri * 1000000 / w2).toLong
    assert(trans(edges) == ((tri, expected)))
  }

  test("incremental transitivity: maintained readout equals the one-shot batch across waves") {
    val rnd = new scala.util.Random(139)
    for (trial <- 1 to 2) {
      val all = Seq.fill(130)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
        .distinct
      val (base, delta) = all.partition(e => (e._1 + e._2) % 4 != 0)
      if (delta.nonEmpty) {
        val got = Graphs.incrementalTransitivity(
            Graphs.triangleCounts(base.toDF("a", "b")),
            base.toDF("a", "b"), delta.toDF("a", "b"))
          .collect()(0)
        assert((got.getLong(0), got.getLong(1)) == trans(all), s"trial $trial")
      }
    }
  }

  private def lex(rows: Seq[(String, String)]): Map[String, (Long, Long, Long, Long, Long)] =
    TextAnalysis.lexicalDiversity(rows.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("lexical diversity: hand case — repeats, types, hapax") {
    val rows = Seq(
      ("tpl", "the cat sat"), ("tpl", "the cat sat"), ("tpl", "the cat ran"),
      ("nat", "one two three four"))
    val got = lex(rows)
    // tpl: tokens 9, types {the, cat, sat, ran} = 4, hapax {ran} = 1
    assert(got("tpl") == ((9L, 4L, 1L, 4000000L / 9L, 250000L)))
    // nat: 4 tokens, 4 types, 4 hapax
    assert(got("nat") == ((4L, 4L, 4L, 1000000L, 1000000L)))
  }

  test("lexical diversity: random docs equal a JVM replica") {
    val rnd = new scala.util.Random(137)
    val rows = Seq.fill(80)((s"s${rnd.nextInt(3)}",
      Seq.fill(1 + rnd.nextInt(12))(s"w${rnd.nextInt(15)}").mkString(" ")))
    val expected = rows.groupBy(_._1).map { case (g, xs) =>
      val toks = xs.flatMap(_._2.split(" "))
      val byTok = toks.groupBy(identity).map(_._2.size.toLong)
      val (nt, ty, hx) = (toks.size.toLong, byTok.size.toLong,
        byTok.count(_ == 1L).toLong)
      g -> ((nt, ty, hx, ty * 1000000L / nt, hx * 1000000L / ty))
    }
    assert(lex(rows) == expected)
  }
}
