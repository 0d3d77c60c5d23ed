package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PinnedCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pin caches; releaseAll unpersists and empties the registry") {
    import spark.implicits._
    PinnedCache.releaseAll() // isolate from other suites' pins
    val df = PinnedCache.pin(Seq(1, 2, 3).toDF("x"))
    assert(df.storageLevel != StorageLevel.NONE)
    assert(PinnedCache.size >= 1)
    assert(df.agg(sum($"x")).as[Long].head() == 6L)
    PinnedCache.releaseAll()
    assert(PinnedCache.size == 0)
    assert(df.storageLevel == StorageLevel.NONE)
    // unpersisted frames still compute correctly (recompute, not corruption)
    assert(df.agg(sum($"x")).as[Long].head() == 6L)
  }

  test("operators run correctly after an eager releaseAll between calls") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different words appear in this one text")
    ).toDF("doc_id", "text")
    val r1 = Dedup.jaccardPairs(docs, "text", "doc_id", 0.3, 3).count()
    PinnedCache.releaseAll()
    val r2 = Dedup.jaccardPairs(docs, "text", "doc_id", 0.3, 3).count()
    assert(r1 == r2)
  }

  test("gopherKeepJvm counts code points like the Column form (non-BMP)") {
    import spark.implicits._
    // 𝒜 (U+1D49C) is non-BMP: 2 UTF-16 units, 1 code point. Build texts that
    // straddle the cw >= 3*wc boundary so a UTF-16-unit count would flip keep.
    val base = (1 to 60).map(i => s"ok${i % 7}w").mkString(" ")
    val texts = Seq(
      base,
      base + " " + ("𝒜" * 10), // 10 astral chars appended
      ("𝒜𝒝 x " * 30).trim
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val batch = TextAnalysis.gopherRules(df, "text", "doc_id")
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(TextAnalysis.gopherKeepJvm(t) == batch(i.toLong),
        s"JVM/Column gopher divergence on text $i")
    }
  }
}
