package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Graphs.incrementalHyperAnfTrace]] — the 18th maintained form. Pins:
  * (1) maintained trace ≡ one-shot trace FRAME-EXACTLY per round across
  * 3 disjoint-wave schedules (registers, not just readouts); (2) the
  * census over the maintained trace ≡ the batch census (the q369 oracle
  * composition); (3) brand-new nodes and delta-internal edges enter the
  * balls correctly; (4) chained waves (trace of wave n feeds wave n+1). */
class IncrementalHyperAnfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val all: Seq[(String, String)] = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "f"),
    ("f", "g"), ("g", "a"), ("x", "y"), ("y", "z"), ("e", "h"),
    ("h", "i"), ("i", "j"), ("b", "f"),
  )

  test("maintained trace ≡ one-shot per round, 3 schedules; census matches") {
    val batchTrace = Graphs.hyperAnfTrace(all.toDF("a", "b"), rounds = 3)
    val batchFrames = batchTrace.map(sortedRows)
    val batchOut = sortedRows(Graphs.hyperAnfFromTrace(batchTrace))
    val schedules = Seq[(((String, String))) => Int](
      e => (e._1 + e._2).hashCode.abs % 3,
      e => (e._2 + e._1 + "7").hashCode.abs % 3,
      e => (e._1 + "13" + e._2).hashCode.abs % 3)
    schedules.zipWithIndex.foreach { case (h, si) =>
      val base = all.filter(e => h(e) == 0)
      val delta = all.filter(e => h(e) != 0)
      assume(base.nonEmpty && delta.nonEmpty)
      val inc = Graphs.incrementalHyperAnfTrace(
        Graphs.hyperAnfTrace(base.toDF("a", "b"), rounds = 3),
        base.toDF("a", "b"), delta.toDF("a", "b"))
      inc.zip(batchFrames).zipWithIndex.foreach { case ((got, want), k) =>
        assert(sortedRows(got) == want, s"schedule $si round $k diverged")
      }
      assert(sortedRows(Graphs.hyperAnfFromTrace(inc)) == batchOut,
        s"schedule $si census diverged")
    }
  }

  test("chained waves: trace of wave n feeds wave n+1, end state ≡ one-shot") {
    val batchFrames = Graphs.hyperAnfTrace(all.toDF("a", "b"), rounds = 2)
      .map(sortedRows)
    val w0 = all.take(5); val w1 = all.slice(5, 9); val w2 = all.drop(9)
    var trace = Graphs.hyperAnfTrace(w0.toDF("a", "b"), rounds = 2)
    var base = w0
    Seq(w1, w2).foreach { w =>
      trace = Graphs.incrementalHyperAnfTrace(trace,
        base.toDF("a", "b"), w.toDF("a", "b"))
      base = base ++ w
    }
    trace.zip(batchFrames).zipWithIndex.foreach { case ((got, want), k) =>
      assert(sortedRows(got) == want, s"chained round $k diverged")
    }
  }

  test("delta bridging two components grows both sides' balls; isolated old rows verbatim") {
    val base = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val delta = Seq(("c", "x"), ("p", "q")) // bridge + brand-new component
    val inc = Graphs.incrementalHyperAnfTrace(
      Graphs.hyperAnfTrace(base.toDF("a", "b"), rounds = 3),
      base.toDF("a", "b"), delta.toDF("a", "b"))
    val batch = Graphs.hyperAnfTrace((base ++ delta).toDF("a", "b"), rounds = 3)
    inc.zip(batch).zipWithIndex.foreach { case ((got, want), k) =>
      assert(sortedRows(got) == sortedRows(want), s"round $k diverged")
    }
    // p/q really are present after round 1: 5 base + 2 new nodes
    val ests = Graphs.hyperAnfFromTrace(inc).orderBy(col("t")).collect()
    assert(ests.head.getLong(1) == 7L)
  }
}
