package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TokenizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Independent reference: recursive formulation of greedy longest-match
    * (the operator's loop is iterative/allocation-free). */
  def refPieces(word: String, merges: Seq[String]): List[String] =
    if (word.isEmpty) Nil
    else {
      val maxLen = (merges.map(_.length) :+ 1).max
      val take = (math.min(maxLen, word.length) to 2 by -1)
        .find(l => merges.contains(word.substring(0, l)))
        .getOrElse(1)
      word.substring(0, take) :: refPieces(word.substring(take), merges)
    }

  test("hand-verified greedy longest-match examples") {
    // "there": 'ther' wins over 'the' (longest match), then 'e' falls back
    assert(Tokenize.pieces("there") == Seq("ther", "e"))
    assert(Tokenize.pieces("the") == Seq("the"))
    // longest-match is greedy, not globally optimal: 'atio' before 'n'
    assert(Tokenize.pieces("information") == Seq("in", "for", "ma", "tion"))
    assert(Tokenize.pieces("xyzzy") == Seq("x", "y", "z", "z", "y"))
    assert(Tokenize.pieces("") == Seq())
    // pieces always reassemble the word
    assert(Tokenize.pieces("straightforward").mkString == "straightforward")
  }

  test("operator agrees with the independent recursive reference on random words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789!."
    val words = (1 to 300).map(_ =>
      (0 until rnd.nextInt(18)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    words.foreach { w =>
      val got = Tokenize.pieces(w)
      val want = refPieces(w, Tokenize.DefaultMerges)
      assert(got == want, s"mismatch on '$w'")
      assert(got.mkString == w)
      assert(Tokenize.pieceCount(w,
        Tokenize.byLength(Tokenize.DefaultMerges)._1,
        Tokenize.byLength(Tokenize.DefaultMerges)._2) == want.length)
    }
  }

  test("wordpieceCounts: per-doc counts equal the word-by-word reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60)
    val got = Tokenize.wordpieceCounts(spark, docs, "text", "doc_id")
      .collect().map(c => c.doc_id -> ((c.n_words, c.n_subwords))).toMap
    docs.collect().foreach { r =>
      val words = r.getString(1).split(" ", -1)
      val want = (words.length.toLong,
        words.map(w => refPieces(w, Tokenize.DefaultMerges).length.toLong).sum)
      assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("custom merges vocabulary is honored; empty merges = char count") {
    assert(Tokenize.pieces("banana", Seq("ban", "na")) == Seq("ban", "a", "na"))
    assert(Tokenize.pieces("banana", Seq.empty) == "banana".map(_.toString))
    intercept[IllegalArgumentException] {
      Tokenize.pieces("x", Seq("a")) // single-char merges are the implicit fallback
    }
  }

  test("bpePairCounts: frequency-weighted adjacent pairs match brute force, ordered") {
    import spark.implicits._
    val docs = Seq("aa ab aa", "ab ba x", "aa aa b").map(Tuple1(_))
    val brute = docs.flatMap(_._1.split(" ")).filter(_.length >= 2)
      .flatMap(w => w.sliding(2).map(p => s"${p(0)} ${p(1)}"))
      .groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val want = brute.toSeq.sortBy { case (p, c) => (-c, p) }
    val got = Tokenize.bpePairCounts(docs.toDF("text"), "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want.take(10))
    // "a a" dominates: aa appears 4x + sliding inside nothing else
    assert(got.head == (("a a", 4L)))
  }

  test("bpeSymbols: ranked-merge recurrence on cascades, rank priority, and misses") {
    val ranks = Tokenize.DefaultRankedMerges.zipWithIndex.toMap
    assert(Tokenize.bpeSymbols("table", ranks) == Vector("table")) // 4-level cascade
    assert(Tokenize.bpeSymbols("order", ranks) == Vector("order")) // uses merged 'er'
    assert(Tokenize.bpeSymbols("scan", ranks) == Vector("scan"))   // merged-symbol pair sc+an
    // rank order decides: ('s','t') rank 17 beats ('r','e') rank 19, so
    // 'st' forms first and 'st'+'re' (rank 18) completes 'stre'
    assert(Tokenize.bpeSymbols("stream", ranks) == Vector("stre", "a", "m"))
    assert(Tokenize.bpeSymbols("zzz", ranks) == Vector("z", "z", "z")) // no merges apply
    assert(Tokenize.bpeSymbols("", ranks) == Vector.empty)
    assert(Tokenize.bpeSymbols("a", ranks) == Vector("a"))
  }

  test("bpeSymbols: leftmost occurrence merges first on same-pair runs") {
    val ranks = Map(("a", "a") -> 0)
    // merge-all-non-overlapping-leftmost semantics fall out of the recurrence
    assert(Tokenize.bpeSymbols("aaa", ranks) == Vector("aa", "a"))
    assert(Tokenize.bpeSymbols("aaaa", ranks) == Vector("aa", "aa"))
  }

  test("bpeCounts: per-doc totals match the JVM loop applied per word; repartition-invariant") {
    import spark.implicits._
    val ranks = Tokenize.DefaultRankedMerges.zipWithIndex.toMap
    val docs = Seq((1L, "table stream key"), (2L, "order order zz"), (3L, "a"))
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => Tokenize.bpeSymbols(w, ranks).length.toLong).sum)
    }
    val df = docs.toDF("doc_id", "text")
    for (parts <- Seq(1, 7)) {
      val got = Tokenize.bpeCounts(spark, df.repartition(parts), "text", "doc_id")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }
}
