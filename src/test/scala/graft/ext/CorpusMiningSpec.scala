package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Units for the corpus-mining operators. The oracle-backed q76-q80 check
  * bit-exactness against DuckDB; these pin the hand-computable semantics on
  * tiny fixtures plus the invariants the designs rely on (integer-exact
  * anomaly cut, rank-permutation-invariant Gini under ties). */
class CorpusMiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("repeatedNgramRate: shared span flagged in both docs, unique doc clean") {
    import spark.implicits._
    // docs 1 and 2 share the exact 3-gram "a b c"; doc 3 shares nothing.
    val docs = Seq(
      (1L, "a b c x y"),
      (2L, "q a b c z"),
      (3L, "p q r s t"),
    ).toDF("doc_id", "text")
    val out = CorpusMining.repeatedNgramRate(docs, "text", "doc_id", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // each doc has 3 spans; docs 1/2 have exactly one duplicated gram each
    assert(out == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
  }

  test("repeatedNgramRate: docs shorter than n produce no rows") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = CorpusMining.repeatedNgramRate(docs, "text", "doc_id", 3)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("removeRepeatedSpans: shared span removed from both docs, short/unique docs intact") {
    import spark.implicits._
    // docs 1/2 share the 3-gram "a b c" at different positions; doc 3 is
    // unique; doc 4 is shorter than n and must pass through untouched.
    val docs = Seq(
      (1L, "a b c x y"),
      (2L, "q a b c z"),
      (3L, "p q r s t"),
      (4L, "u v"),
    ).toDF("doc_id", "text")
    val out = CorpusMining.removeRepeatedSpans(docs, "text", "doc_id", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 5L, 3L), (2L, 5L, 3L), (3L, 5L, 0L), (4L, 2L, 0L)))
    // doc 1 keeps "x y", doc 2 keeps "q z" — fingerprints of the rebuilt text
    val md5xy = java.security.MessageDigest.getInstance("MD5")
      .digest("x y".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0)._4 == md5xy)
  }

  test("removeRepeatedSpans: within-doc self-repetition does NOT trigger removal") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c a b c"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val out = CorpusMining.removeRepeatedSpans(docs, "text", "doc_id", 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L), "cross-doc criterion: no removal")
  }

  test("removeRepeatedSpans: identical docs empty out, fingerprint is md5 of empty string") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = CorpusMining.removeRepeatedSpans(docs, "text", "doc_id", 3)
      .orderBy("doc_id").collect()
    assert(out.forall(r => r.getLong(2) == 4L))
    assert(out.forall(_.getString(3) == "d41d8cd98f00b204e9800998ecf8427e"))
  }

  test("tfidfKeywords: rarer term outranks commoner term at equal tf") {
    import spark.implicits._
    // in doc 1: "rare" df=1 (score 3/1=3), "filler" df=2 (score 3/2=1.5),
    // "common" df=3 (score 1).
    val docs = Seq(
      (1L, "rare common filler"),
      (2L, "common filler y"),
      (3L, "common u v"),
    ).toDF("doc_id", "text")
    val top = CorpusMining.tfidfKeywords(docs, "text", "doc_id", 2)
      .where(col("doc_id") === 1L).orderBy("rk")
      .select("w", "score").collect()
    assert(top(0).getString(0) == "rare" && top(0).getDouble(1) == 3.0)
    assert(top(1).getString(0) == "filler" && top(1).getDouble(1) == 1.5)
  }

  test("collocations: always-adjacent pair has maximal lift") {
    import spark.implicits._
    // "x y" always adjacent (lift = T/(n_x*n_y) maximal), "a b" random-ish.
    val docs = (1 to 30).map(i => (i.toLong, s"x y a c b a")).toDF("doc_id", "text")
    val out = CorpusMining.collocations(docs, "text", "doc_id", 20L, 5)
      .collect().map(r => (r.getString(0), r.getDouble(4)))
    // T=180; "x y" and "c b": 30*180/(30*30)=6.0 (tie, string order);
    // "y a"/"a c"/"b a": 30*180/(30*60)=3.0
    assert(out.take(2).toSeq == Seq(("c b", 6.0), ("x y", 6.0)))
    assert(out.forall(_._2 <= 6.0))
  }

  test("hourlyAnomalies: constant series is flat, spike flagged; integer cut == double cut") {
    import spark.implicits._
    val hour = 3600000000000L
    // type "flat": 1 event/hour for 10 hours. type "spiky": 9 hours of 1 + one hour of 50.
    val flat = (0 until 10).map(h => ("flat", h * hour + 5L))
    val spiky = (0 until 9).map(h => ("spiky", h * hour + 5L)) ++
      (0 until 50).map(i => ("spiky", 9 * hour + i.toLong))
    val ev = (flat ++ spiky).toDF("event_type", "ts")
    val out = CorpusMining.hourlyAnomalies(ev, "event_type", "ts")
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    (0 until 10).foreach { h =>
      val (n, z, flag) = out(("flat", h.toLong))
      assert(n == 1L && z == 0.0 && flag == 0L)
    }
    val (n9, z9, f9) = out(("spiky", 9L))
    assert(n9 == 50L && f9 == 1L && z9 > 2.0)
    // the integer flag must agree with the double z-score cut everywhere
    out.values.foreach { case (_, z, flag) =>
      assert((math.abs(z) > 2.0) == (flag == 1L), s"z=$z flag=$flag")
    }
  }

  test("boilerplate: repeated template span tops its source; strings recovered from hashes") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "header foo bar tail one"),
      ("s1", "header foo bar tail two"),
      ("s1", "header foo bar tail three"),
      ("s1", "x y z w v"),
      ("s2", "unique a b c d"),
    ).toDF("source", "text")
    val out = CorpusMining.boilerplate(docs, "text", "source", 4, 2L, 3)
      .orderBy("source", "rk").collect()
    // "header foo bar tail" occurs 3x in s1 and ranks first; "foo bar tail one"
    // etc. occur once each; s2 has no repeats -> absent
    assert(out.map(_.getString(0)).toSet == Set("s1"))
    assert(out(0).getString(2) == "header foo bar tail" && out(0).getLong(3) == 3L)
  }

  test("copurchasePairs: support counted per order with duplicates collapsed") {
    import spark.implicits._
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup line: same part twice in order 1
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
    ).toDF("l_orderkey", "l_partkey")
    val out = CorpusMining.copurchasePairs(li, "l_orderkey", "l_partkey", 2L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((10L, 20L, 2L))) // (10,30) has support 1 -> filtered
  }

  test("pearsonIntGrid: perfect linear -> 1, anti -> -1, zero variance -> 0") {
    import spark.implicits._
    def r(pairs: Seq[(Long, Long)]): Double =
      CorpusMining.pearsonIntGrid(pairs.toDF("a", "b"), col("a"), col("b"))
        .collect()(0).getDouble(1)
    assert(r((1L to 10L).map(i => (i, 2 * i + 3))) == 1.0)
    assert(r((1L to 10L).map(i => (i, -i))) == -1.0)
    assert(r((1L to 10L).map(i => (i, 7L))) == 0.0)
    val mixed = r(Seq((1L, 1L), (2L, 5L), (3L, 2L), (4L, 8L)))
    assert(mixed > 0.0 && mixed < 1.0)
  }

  test("giniByGroup: equal values -> 0; extreme concentration -> (n-1)/n") {
    import spark.implicits._
    val df = (
      (1 to 10).map(i => ("equal", 7L, i.toLong)) ++
        ((1 to 9).map(i => ("conc", 0L, i.toLong)) :+ (("conc", 100L, 10L)))
    ).toDF("grp", "x", "id")
    val out = CorpusMining.giniByGroup(df, "grp", col("x"), col("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("equal") == 0.0)
    assert(out("conc") == 0.9) // all mass in one of 10 rows: gini = (n-1)/n
  }

  test("giniByGroup: tie permutation does not change the coefficient") {
    import spark.implicits._
    val a = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 3L, 3L)).toDF("grp", "x", "id")
    val b = Seq(("g", 5L, 2L), ("g", 5L, 1L), ("g", 3L, 3L)).toDF("grp", "x", "id")
    val ga = CorpusMining.giniByGroup(a, "grp", col("x"), col("id")).collect()(0).getDouble(3)
    val gb = CorpusMining.giniByGroup(b, "grp", col("x"), col("id")).collect()(0).getDouble(3)
    assert(ga == gb)
  }

  test("phraseOccurrences: overlaps counted, boundaries hit, short/no-match docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),   // "a b" at positions 1,3,5
      (2L, "a a a a"),       // "a a" overlapping would be 3 — different phrase here
      (3L, "x y a b"),       // match at the end boundary
      (4L, "a b x y"),       // match at the start boundary
      (5L, "a"),             // shorter than the phrase: no candidate positions
      (6L, "b a x"),         // tokens present but never adjacent in order
      (7L, "ab ba"))         // substring of a token must NOT match
      .toDF("doc_id", "text")
    val got = CorpusMining.phraseOccurrences(docs, "text", "doc_id", "a b")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (3L, 1L), (4L, 1L)))
    // overlapping occurrences all count
    val overlap = CorpusMining.phraseOccurrences(docs, "text", "doc_id", "a a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(overlap == Seq((2L, 3L)))
    // phrase of one token = token frequency
    val single = CorpusMining.phraseOccurrences(docs, "text", "doc_id", "a")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(single == Seq((1L, 3L), (2L, 4L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }
}
