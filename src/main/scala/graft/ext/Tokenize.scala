package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT subword tokenization via greedy longest-match against a merges
  * vocabulary — the BPE/WordPiece-inference scheme (reference corpus stats
  * use whitespace words; this goes beyond parity for LLM-budget math, where
  * `TextAnalysis.subwordTokenCount`'s regex is only an estimator).
  *
  * Semantics: text splits on single spaces (Spark `split` semantics,
  * empties kept); within each word, scan left to right and at every
  * position consume the LONGEST vocabulary piece that matches, else exactly
  * one character (the implicit single-char fallback keeps tokenization
  * total over any input — no [UNK] state to thread through budget math).
  * This is WordPiece inference with a merges table and char fallback; the
  * piece count is deterministic and engine-portable (the DuckDB oracle
  * replays the same greedy loop as a recursive CTE over literal IN-lists).
  *
  * Scale shape: the merges table is MODEL STATE (a few hundred strings —
  * real BPE vocabs are ~50k, still kilobytes-to-megabytes): held as a
  * per-length array of hash sets in the task closure (a broadcast in
  * spirit and, at real vocab sizes, worth an explicit `sc.broadcast`), one
  * map-only pass over docs, zero shuffles before the caller's aggregate.
  */
object Tokenize {

  /** Default merges vocabulary: frequent English character pairs/triples/
    * quads (a hand-built stand-in for a trained BPE merges file — the
    * OPERATOR takes any vocabulary; this fixture makes queries
    * deterministic and lets the oracle interpolate the same literals). */
  val DefaultMerges: Seq[String] = Seq(
    "tion", "atio", "ment", "ther", "ight", "ough",
    "the", "ing", "and", "ion", "ent", "for", "her", "ter", "est", "ati",
    "ver", "con", "res", "all", "ers", "pro",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur")

  /** Per-length lookup built once per closure: index l holds the length-l
    * pieces. */
  private[ext] def byLength(merges: Seq[String]): (Array[Set[String]], Int) = {
    require(merges.forall(_.length >= 2), "merges must be multi-char (single chars are the implicit fallback)")
    val maxLen = if (merges.isEmpty) 1 else merges.map(_.length).max
    val sets = Array.fill(maxLen + 1)(Set.empty[String])
    merges.foreach(m => sets(m.length) += m)
    (sets, maxLen)
  }

  /** Greedy longest-match pieces of one word (test/inspection surface —
    * the counting path never materializes the list). */
  def pieces(word: String, merges: Seq[String] = DefaultMerges): Seq[String] = {
    val (sets, maxLen) = byLength(merges)
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      var take = 1
      while (l >= 2) {
        if (sets(l).contains(word.substring(pos, pos + l))) { take = l; l = 1 }
        else l -= 1
      }
      out += word.substring(pos, pos + take)
      pos += take
    }
    out.result()
  }

  /** Exact greedy piece COUNT for one word — the hot loop (no
    * allocations). */
  def pieceCount(word: String, sets: Array[Set[String]], maxLen: Int): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      var take = 1
      while (l >= 2) {
        if (sets(l).contains(word.substring(pos, pos + l))) { take = l; l = 1 }
        else l -= 1
      }
      pos += take
      n += 1
    }
    n
  }

  final case class SubwordCount(doc_id: Long, n_words: Long, n_subwords: Long)

  /** Per-doc exact subword counts: one map-only partition pass, merges as
    * closure-held model state. */
  def wordpieceCounts(spark: SparkSession, df: DataFrame, textCol: String,
      idCol: String, merges: Seq[String] = DefaultMerges): Dataset[SubwordCount] = {
    import spark.implicits._
    val (sets, maxLen) = byLength(merges)
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = text.split(" ", -1)
          var subwords = 0L
          var i = 0
          while (i < words.length) {
            subwords += pieceCount(words(i), sets, maxLen)
            i += 1
          }
          SubwordCount(id, words.length.toLong, subwords)
        }
      }
  }

  /** The greedy longest-match decision as SQL CASE WHEN lines over a word
    * column `w` and position `pos` — per-length literal IN-lists, longest
    * first (shared by [[oracleSqlFor]] and composed oracles like the
    * exact-token mixture plan). */
  def greedyCaseWhens(merges: Seq[String]): String = {
    val (sets, maxLen) = byLength(merges)
    (maxLen to 2 by -1).filter(sets(_).nonEmpty).map { l =>
      val lits = sets(l).toSeq.sorted.map(m => s"'$m'").mkString(",")
      s"      WHEN substring(w, pos, $l) IN ($lits) THEN $l"
    }.mkString("\n")
  }

  /** The DuckDB greedy-loop replica for a merges vocabulary: a recursive
    * CTE stepping one piece per iteration, longest-match via per-length
    * literal IN-lists (the RhpSig interpolate-the-model pattern). `docs`
    * must expose `doc_id` and `text`. */
  def oracleSqlFor(merges: Seq[String]): String = {
    val whens = greedyCaseWhens(merges)
    s"""WITH RECURSIVE w AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
       |steps AS (
       |  SELECT doc_id, w, 1 AS pos, 0 AS n FROM w
       |  UNION ALL
       |  SELECT doc_id, w,
       |    pos + CASE
       |$whens
       |      ELSE 1 END,
       |    n + 1
       |  FROM steps WHERE pos <= len(w))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n) AS BIGINT) AS n_subwords
       |FROM steps WHERE pos > len(w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The TRAINING side of BPE ([[wordpieceCounts]] is inference with a
    * given vocabulary): corpus-wide adjacent-symbol pair counts weighted
    * by word frequency — the statistic each BPE merge step maximizes
    * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
    * with Subword Units"). Top `topK` candidate merges with a
    * deterministic (count desc, pair) tiebreak.
    *
    * Scale design: the word-frequency rollup is one map-side-combinable
    * shuffle; pair explosion runs over DISTINCT words only, so its cost
    * scales with the VOCABULARY (bounded) rather than the corpus; the
    * pair rollup is again partial-agg'd; top-k plans
    * TakeOrderedAndProject — per-partition heaps, never a global sort. */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val words = df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    words.select(col("cnt"), explode(expr(
        """transform(sequence(1, length(word) - 1),
          |  i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1)))"""
          .stripMargin)).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topK)
      .select(col("pair"), col("cnt"))
  }
}
