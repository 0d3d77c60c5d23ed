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

  // --- BPE ENCODING with a ranked merge table ---------------------------
  //
  // The third leg of the tokenizer story: q130 computes the training
  // statistic (pair counts), wordpieceCounts does longest-match inference,
  // and this does RANKED-MERGE inference — the actual BPE encode loop
  // (Sennrich et al. 2016; the GPT-2 tokenizer family): repeatedly merge
  // the occurrence of the LOWEST-RANKED adjacent symbol pair (leftmost on
  // rank ties) until no ranked pair remains. Exact and deterministic;
  // unlike longest-match, merge ORDER matters ("s t" ranking above "r e"
  // decides how 'stream' splits). Semantics note at the variant level:
  // merging one leftmost occurrence per step and re-evaluating is the
  // fixed recurrence both engines replay (for same-pair runs it equals the
  // merge-all-occurrences step; when a merge creates a better-ranked pair
  // the re-evaluation sees it immediately — documented, deterministic).

  /** Ranked merges fixture: cascading merges over the corpus alphabet,
    * exercising rank priority (('s','t') outranks ('r','e'), deciding
    * 'stream'), multi-level cascades ('t a'→'ta b'→'tab l'→'tabl e'), and
    * merged-symbol pairs ('sc'+'an'). A stand-in for a trained merges.txt
    * — the operator takes any ranked list; real vocabs are ~50k rows of
    * MODEL STATE (kilobytes, broadcast). */
  val DefaultRankedMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("e", "r"), ("o", "r"), ("a", "n"),
    ("s", "c"), ("sc", "an"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("or", "d"), ("ord", "er"),
    ("r", "o"), ("ro", "w"),
    ("s", "t"), ("st", "re"), ("r", "e"),
    ("a", "g"), ("ag", "g"),
    ("k", "e"), ("ke", "y"))

  /** One word's BPE symbols under the ranked merge recurrence — the JVM
    * reference both the distributed operator and the oracle replicate. */
  def bpeSymbols(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = Vector(word.map(_.toString): _*)
    var done = word.isEmpty
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i } // strict: leftmost wins ties
        i += 1
      }
      if (bestPos < 0) done = true
      else syms = syms.patch(bestPos, Seq(syms(bestPos) + syms(bestPos + 1)), 2)
    }
    syms
  }

  final case class BpeWord(word: String, n_bpe: Long)

  /** Per-doc exact BPE token counts.
    *
    * Scale shape: the merge loop runs once per DISTINCT word (cost scales
    * with the vocabulary, not the corpus — the exploded occurrence join
    * carries only (word, n_bpe) longs back), the per-word frame joins the
    * exploded docs on the word key (auto-broadcast at realistic vocab
    * sizes), and the rollup is one partial-agg'd sum per doc. */
  def bpeCounts(spark: SparkSession, df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)] = DefaultRankedMerges): DataFrame = {
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val words = df.select(explode(split(col(textCol), " ", -1)).as("word"))
      .distinct().as[String]
      .mapPartitions(_.map(w => BpeWord(w, bpeSymbols(w, ranks).length.toLong)))
    df.select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("word"))
      .join(words.toDF(), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("n_bpe")).as("n_bpe_tokens"))
  }

  /** The ranked merge list as a DuckDB list literal of 'left right' keys,
    * in rank order (the interpolate-the-model pattern). */
  def rankListSql(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"'$a $b'" }.mkString("[", ",", "]")

  /** DuckDB replica of the BPE recurrence: a recursive CTE over DISTINCT
    * words, one merge per iteration — best pair = argmin of
    * (rank*1000 + position) via list comprehensions over the interpolated
    * rank-list literal (list_position is 1-based and returns 0, not NULL,
    * on a miss — hence the `> 0` guards). */
  def bpeOracleSql(merges: Seq[(String, String)]): String = {
    val rl = rankListSql(merges)
    s"""WITH RECURSIVE wc AS (
       |  SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents),
       |st AS (
       |  SELECT word, array_to_string([substring(word,i,1) FOR i IN generate_series(1,len(word))],' ') AS s
       |  FROM wc
       |  UNION ALL
       |  SELECT word,
       |    array_to_string(list_concat(list_concat(syms[1:bp-1], [syms[bp] || syms[bp+1]]), syms[bp+2:]), ' ') AS s
       |  FROM (
       |    SELECT word, syms, CAST(k % 1000 AS INT) AS bp FROM (
       |      SELECT word, syms,
       |        list_min(list_transform(
       |          list_filter(generate_series(1, len(syms)-1),
       |            i -> list_position($rl, syms[i] || ' ' || syms[i+1]) > 0),
       |          i -> (list_position($rl, syms[i] || ' ' || syms[i+1]) - 1) * 1000 + i)) AS k
       |      FROM (SELECT word, string_split(s,' ') AS syms FROM st)
       |    ) WHERE k IS NOT NULL
       |  )
       |),
       |fin AS (
       |  SELECT word, CAST(len(string_split(s,' ')) AS BIGINT) AS n_bpe
       |  FROM (SELECT word, s, string_split(s,' ') AS syms FROM st)
       |  WHERE len(list_filter(generate_series(1, len(syms)-1),
       |      i -> list_position($rl, syms[i] || ' ' || syms[i+1]) > 0)) = 0
       |),
       |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
       |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(f.n_bpe) AS BIGINT) AS n_bpe_tokens
       |FROM w JOIN fin f ON w.word = f.word
       |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin
  }
}
