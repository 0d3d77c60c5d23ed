package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Units for the corpus-hygiene operators behind q47–q49: repetition
  * ratio, decontamination, exact quantiles. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("repetitionRatio: duplicates counted, short docs are 0") {
    import spark.implicits._
    val got = Seq(
      "a b c a b c a b",      // grams: abc,bca,cab,abc,bca,cab -> 3/6 dup
      "x y z w",              // 2 grams, both distinct -> 0.0
      "one two",              // < 3 tokens -> 0.0 (guarded)
      "")                     // empty -> 0.0
      .toDF("t")
      .select(TextAnalysis.repetitionRatio(col("t"), 3).as("r"))
      .as[Double].collect().toList
    assert(got == List(0.5, 0.0, 0.0, 0.0))
  }

  test("wordNgrams descends gracefully for any n") {
    import spark.implicits._
    val df = Seq("a b c d").toDF("t")
    assert(df.select(size(TextAnalysis.wordNgrams(col("t"), 2))).as[Int].head() == 3)
    assert(df.select(size(TextAnalysis.wordNgrams(col("t"), 4))).as[Int].head() == 1)
    assert(df.select(size(TextAnalysis.wordNgrams(col("t"), 5))).as[Int].head() == 0)
  }

  test("contaminatedDocs finds overlap and counts distinct shared grams") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "saw the quick brown fox yesterday"), // shares "the quick brown", "quick brown fox"
      (2L, "completely unrelated text entirely"),
      (3L, "brown fox jumps high today"))        // shares "brown fox jumps"
      .toDF("doc_id", "text")
    val got = Dedup.contaminatedDocs(train, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("lexicalDiversity: hand-computed TTR and hapax on known docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c a b"),   // 6 tokens, 3 types (a:3,b:2,c:1), 1 hapax
      (2L, "x y z"))         // all hapax
      .toDF("doc_id", "text")
    val got = CorpusStats.lexicalDiversity(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1L) == ((6L, 3L, 1L, 0.5, 1.0 / 6)))
    assert(got(2L) == ((3L, 3L, 3L, 1.0, 1.0)))
  }

  test("hashed decontamination equals the string form on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = docs.where(col("source") === "src0")
    val train = docs.where(col("source") =!= "src0")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strings = toMapOf(Dedup.contaminatedDocs(train, bench, "text", "doc_id", 5))
    val hashed = toMapOf(Dedup.contaminatedDocsHashed(train, bench, "text", "doc_id", 5))
    assert(strings.nonEmpty)
    assert(hashed == strings)
  }

  test("exactQuantiles picks rank-position values per group") {
    import spark.implicits._
    // group g: values 1..10 -> p50 = rank ceil(5)=5, p90 = rank 9, p99 = rank 10
    val df = (1 to 10).map(v => ("g", v)).toDF("src", "v")
    val row = CorpusStats.exactQuantiles(df, "src", col("v"), Seq(0.5, 0.9, 0.99))
      .collect().head
    assert(row.getLong(1) == 10L) // n
    assert(row.getLong(2) == 5L)  // p50
    assert(row.getLong(3) == 9L)  // p90
    assert(row.getLong(4) == 10L) // p99
  }

  test("approx_percentile (the huge-group scale path) tracks exactQuantiles") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = CorpusStats.exactQuantiles(docs, "source",
        TextAnalysis.tokenCount(col("text")), Seq(0.5, 0.9))
      .select(col("source"), col("p50"), col("p90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = docs
      .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("v"))
      .groupBy("source")
      .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.9)), lit(1000)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    exact.foreach { case (src, (p50, p90)) =>
      assert(math.abs(approx(src)(0) - p50) <= 2, s"$src p50")
      assert(math.abs(approx(src)(1) - p90) <= 4, s"$src p90")
    }
  }

  test("commonnessScore ranks common-token docs above rare-token docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the"),        // 'the' in docs 1,2 -> df 2
      (2L, "the unique"),         // mixed
      (3L, "zzz qqq rrr"))        // singletons -> df 1
      .toDF("doc_id", "text")
    val got = CorpusStats.commonnessScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((6L, 3L, 6.0 / 9)))   // 3 tokens x df 2, N=3
    assert(got(2L) == ((3L, 2L, 3.0 / 6)))   // df 2 + df 1
    assert(got(3L) == ((3L, 3L, 3.0 / 9)))
    assert(got(1L)._3 > got(2L)._3 && got(2L)._3 > got(3L)._3)
  }

  test("exactQuantiles is stable under duplicate values") {
    import spark.implicits._
    val df = Seq(3, 3, 3, 3, 7).map(v => ("g", v)).toDF("src", "v")
    val row = CorpusStats.exactQuantiles(df, "src", col("v"), Seq(0.5, 0.99))
      .collect().head
    assert(row.getLong(2) == 3L)
    assert(row.getLong(3) == 7L)
  }

  test("oovRate: hand-computed rates against a frequency vocabulary") {
    import spark.implicits._
    // "common" appears 3x (in vocab at minCount=2); each doc's rare tokens are OOV
    val docs = Seq(
      (1L, "common common rare1"),
      (2L, "common rare2 rare3 rare2"),
      (3L, "common")).toDF("doc_id", "text")
    // rare2 appears twice -> in vocab too at minCount=2
    val got = CorpusStats.oovRate(docs, "text", "doc_id", minCount = 2L)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 3L, 1L, 1.0 / 3)))  // rare1 OOV
    assert(got(1) == ((2L, 4L, 1L, 0.25)))     // rare3 OOV; rare2 made the vocab
    assert(got(2) == ((3L, 1L, 0L, 0.0)))
  }

  test("simhashNearDupPairs: recall 1.0 vs brute force for dist <= bands-1") {
    import spark.implicits._
    // near-identical docs differ by one token; unrelated docs share none
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"), // near-dup of 1
      (3L, "one two three four five six seven"),
      (4L, "alpha beta gamma delta epsilon zeta")) // exact dup of 1
      .toDF("doc_id", "text")
    val got = Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        bits = 60, bands = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same signatures
    val sigs = docs.select(col("doc_id"), TextAnalysis.simhashN("text", 60).as("sig"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("d"))
      .where(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 4L, 0L))) // exact dup at distance 0
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc never pairs
  }

  test("simhashNearDupPairs rejects parameters that break the recall guarantee") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "text", "doc_id", bits = 60, bands = 4, maxDist = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "text", "doc_id", bits = 60, bands = 7)
    }
  }
}
