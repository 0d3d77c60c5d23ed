package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WebSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def canon(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(col("url"), Web.canonicalizeUrl(col("url")).as("c"),
        Web.hostOf(col("url")).as("h"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }

  test("hand-verified canonicalization cases") {
    val got = canon(
      "http://WWW.Site.com:80/a/?utm_source=feed&x=1#top",
      "https://site.com/a",
      "HTTPS://Site.COM:443/a/b/?id=3&utm_campaign=c&gclid=z",
      "http://www.example.org:8080/p?fbclid=abc",
      "https://example.org/",
      "http://host.net",
      "https://www.host.net/x?utm_a=1&utm_b=2")
    assert(got == Seq(
      ("http://site.com/a?x=1", "site.com"),
      ("https://site.com/a", "site.com"),
      ("https://site.com/a/b?id=3", "site.com"),
      ("http://example.org:8080/p", "example.org"),
      ("https://example.org", "example.org"),
      ("http://host.net", "host.net"),
      ("https://host.net/x", "host.net")))
  }

  test("canonicalization is idempotent") {
    import spark.implicits._
    val urls = Seq(
      "http://WWW.Site.com:80/a/?utm_source=feed&x=1#top",
      "HTTPS://A.B.C:443/d/e/?utm_x=1",
      "http://h.io:8080/p?q=1&utm_z=9")
    val once = canon(urls: _*).map(_._1)
    val twice = once.toDF("url")
      .select(Web.canonicalizeUrl(col("url"))).collect().map(_.getString(0)).toSeq
    assert(once == twice)
  }

  test("fixture URLs cover every noise branch and canonicalize losslessly on host") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = docs.select(
        Web.fixtureUrl(col("doc_id"), col("source"), col("lang")).as("url"))
      .select(col("url"), Web.canonicalizeUrl(col("url")).as("c")).collect()
    val urls = rows.map(_.getString(0))
    assert(urls.exists(_.startsWith("HTTPS://")))
    assert(urls.exists(_.contains("www.")))
    assert(urls.exists(_.contains(":443")))
    assert(urls.exists(_.contains(":8080")))
    assert(urls.exists(_.contains("utm_")))
    assert(urls.exists(_.endsWith("#sec2")))
    val canons = rows.map(_.getString(1))
    assert(canons.forall(c => !c.contains("www.") && !c.contains("utm_")
      && !c.contains("#") && !c.contains(":443") && !c.contains(":80/")
      && c.startsWith("http")))
    assert(canons.exists(_.contains(":8080"))) // real ports survive
  }

  test("mainContent: hand-built page — nav/script dropped, link-heavy p dropped, rest kept") {
    import spark.implicits._
    val html = "<html><body>" +
      "<p>keep this plain text</p>" +
      "<nav><a>home</a> <a>about</a></nav>" +
      "<p><a>spam</a> <a>links</a> x</p>" + // link chars 9 vs text 12: 18 >= 12 -> dropped
      "<script>var x = 1</script>" +
      "<p>second kept <a>ok</a> block</p>" + // link chars 2 vs text 21: kept
      "</body></html>"
    val r = Web.mainContent(Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect()(0)
    assert(r.getAs[Long]("n_blocks") == 5L)
    assert(r.getAs[Long]("n_kept") == 2L)
    val expectedMain = "keep this plain text second kept ok block"
    assert(r.getAs[Long]("main_chars") == expectedMain.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedMain.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("main_md5") == md)
  }

  test("syntheticHtml is deterministic and parses back to its own token count") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three")).toDF("doc_id", "text")
    val h1 = Web.syntheticHtml(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    val h2 = Web.syntheticHtml(docs.repartition(5), "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    assert(h1 == h2, "rendering is a pure function of (doc_id, text)")
    // total text chars across blocks == original text minus spaces at run
    // boundaries: strip ALL markup and compare word multisets
    val words1 = h1.head.replaceAll("<[^>]+>", " ").trim.split("\\s+").toSeq.sorted
    assert(words1 == "alpha beta gamma delta epsilon zeta eta theta iota".split(" ").toSeq.sorted)
  }
}
