package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins [[Web.fixtureLinkHosts]] (the direct token-index derivation the
  * graph-tier queries use) bit-identical to the render-then-extract
  * pipeline (syntheticHtmlLinks → extractLinks → hostOf) that q171/q172
  * keep under test — the exactness proof behind the round-11 fixture
  * cheapening of hostLinkGraph. */
class HostLinkGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("fixtureLinkHosts ≡ render-then-extract per-doc host MULTISET at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val direct = Web.fixtureLinkHosts(docs, "doc_id", "text")
      .groupBy(col("doc_id"), col("dst")).agg(count(lit(1)).as("n"))
    val rendered = Web.extractLinks(
        Web.syntheticHtmlLinks(docs, "doc_id", "text"), "doc_id", "html")
      .select(col("doc_id"), Web.hostOf(col("url")).as("dst"))
      .groupBy(col("doc_id"), col("dst")).agg(count(lit(1)).as("n"))
    assert(direct.exceptAll(rendered).isEmpty, "direct has rows render lacks")
    assert(rendered.exceptAll(direct).isEmpty, "render has rows direct lacks")
    assert(direct.count() > 0, "fixture produced no links at sf0.001")
  }

  test("hostLinkGraph (direct path) ≡ the old rendered symmetrized edge set") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val docs = s.read.parquet(s"$dir/documents.parquet")
    // the pre-round-11 derivation, verbatim
    val links = Web.extractLinks(
      Web.syntheticHtmlLinks(docs, "doc_id", "text"), "doc_id", "html")
    val srcH = docs.select(col("doc_id"),
      Web.hostOf(Web.fixtureUrl(col("doc_id"), col("source"), col("lang")))
        .as("src"))
    val e = links.join(srcH, "doc_id")
      .select(col("src"), Web.hostOf(col("url")).as("dst")).distinct()
    val old = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val now = ExtraQueries.hostLinkGraph(s, dir)
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() == old.count() && now.count() > 0)
  }

  test("fixtureLinkHosts selects the same slots the render marks as <a> hrefs") {
    import spark.implicits._
    // 9 tokens -> runs of 4/4/1; every selected slot must carry exactly one
    // href in the rendered HTML, and its host must match the direct row
    val df = Seq((42L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val direct = Web.fixtureLinkHosts(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val rendered = Web.extractLinks(
        Web.syntheticHtmlLinks(df, "doc_id", "text"), "doc_id", "html")
      .select(col("doc_id"), Web.hostOf(col("url")).as("dst"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(direct == rendered)
  }
}
