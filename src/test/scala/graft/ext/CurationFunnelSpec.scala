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
    val events = graft.replay.TsNanos.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val ks = Histogram.ksDrift(events, col("event_type"), col("value"), 16)
      .collect().map(_.getDouble(3))
    assert(ks.nonEmpty && ks.forall(v => v >= 0.0 && v <= 1.0))
    val wks = Histogram.weeklyKsDrift(events, col("event_type"), col("value"), "ts", 16)
      .collect().map(_.getDouble(5))
    assert(wks.nonEmpty && wks.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("evalContamination: hand-built corpus with known overlap fractions") {
    import spark.implicits._
    // eval doc grams (k=3 over "a b c d e f"): {abc, bcd, cde, def}
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f"), // identical -> 4/4 grams hit
      (2L, "a b c x y z"), // shares only "a b c" -> 1/4
      (3L, "p q r s t"),   // disjoint -> 0
      (4L, "a b"),         // < k tokens: no grams, out of scope
    ).toDF("doc_id", "text")
    val out = Curation.evalContamination(corpus, eval, "text", "doc_id",
        k = 3, thresholdPpm = 500000L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("overlap_ppm") == 1000000L
      && out(1L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Long]("n_grams") == 4L
      && out(2L).getAs[Long]("n_hit") == 1L
      && out(2L).getAs[Long]("overlap_ppm") == 250000L
      && !out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_hit") == 0L
      && !out(3L).getAs[Boolean]("contaminated"))
  }

  test("evalContamination is invariant under corpus repartitioning") {
    val docs = graft.queries.QueryDef.tbl(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.where(col("doc_id") % 29 =!= 0)
    val eval = docs.where(col("doc_id") % 29 === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      Curation.evalContamination(c, eval, "text", "doc_id")
        .orderBy("doc_id").collect().toSeq
    assert(run(corpus) == run(corpus.repartition(13)))
  }
}
