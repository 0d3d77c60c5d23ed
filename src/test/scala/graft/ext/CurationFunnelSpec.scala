package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Invariants of the composed curation funnel and the drift statistics on
  * the real driver corpus — properties that must hold for ANY input, as
  * regression nets beyond the oracle's fixed answer. */
class CurationFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("funnel conservation: total == dropped_gopher + dropped_band + dropped_dup + kept, per source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Curation.curationFunnel(docs, "text", "doc_id", "source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, dg, db, dd, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(total == dg + db + dd + kept, s"conservation broken for ${r.getString(0)}")
      assert(Seq(dg, db, dd, kept).forall(_ >= 0))
    }
    // the funnel must actually drop something and keep something overall
    assert(rows.map(_.getLong(5)).sum > 0 && rows.map(_.getLong(2)).sum > 0)
  }

  test("funnel keep set equals applying the gates + dedup independently") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val funnel = Curation.curationFunnel(docs, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    val g = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .where(col("keep")).select(col("doc_id"))
    val b = Curation.surprisalBandFilter(docs, "text", "doc_id", "source")
      .where(col("keep")).select(col("doc_id"))
    val pool = docs.join(g, "doc_id").join(b, "doc_id")
    val survivors = pool.join(
      pool.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id")),
      Seq("doc_id"), "left_semi")
    val want = survivors.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel.filter(_._2 > 0) == want)
  }

  test("KS statistics live in [0, 1] on the real events table") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ks = Histogram.ksDrift(events, col("event_type"), col("value"), 16)
      .collect().map(_.getDouble(3))
    assert(ks.nonEmpty && ks.forall(v => v >= 0.0 && v <= 1.0))
    val wks = Histogram.weeklyKsDrift(events, col("event_type"), col("value"), "ts", 16)
      .collect().map(_.getDouble(5))
    assert(wks.nonEmpty && wks.forall(v => v >= 0.0 && v <= 1.0))
  }
}
