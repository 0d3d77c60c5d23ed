package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join with PassJoin segment
  * blocking (Li, Deng, Feng — "PassJoin: a partition-based method for
  * similarity joins", PVLDB 5(3), public literature): the exact fuzzy-join
  * primitive for entity resolution over short strings (names, titles,
  * codes).
  *
  * Exactness argument: if ed(a, b) <= d and b is partitioned into d+1
  * contiguous segments, then by pigeonhole at least one segment is touched
  * by no edit, and an optimal alignment maps it to an IDENTICAL substring
  * of a whose start position differs from the segment's by at most the net
  * insertions/deletions before it — at most d. So joining b's segments
  * (the inverted-index side) against all of a's substrings with matching
  * (target length, segment index) within a +-d position window is a
  * COMPLETE candidate generator; `levenshtein` then verifies each
  * candidate. No pair with ed <= d can be missed — the spec's brute-force
  * reference enforces this.
  *
  * Scale design: real corpora carry heavy exact duplication (the driver's
  * part names: 2000 rows, 64 distinct), so the join runs on the
  * exact-dedup'd distinct strings with group counts — the (name, cnt)
  * aggregate is one map-side-combinable shuffle, and every downstream
  * cost scales with DISTINCT strings, not rows. Per distinct string the
  * probe emits O(d^2 (2d+1)) short substrings and the index d+1 segments —
  * constant per string — and the candidate join is an equi-join on
  * (target length, segment index, substring): shuffled hash/SMJ at scale,
  * never all-pairs. Verification is one codegen'd `levenshtein` per
  * DISTINCT candidate pair.
  *
  * Contract: strings shorter than d+1 characters cannot be partitioned
  * into d+1 non-empty segments and are filtered out (for the driver
  * corpus min length is well above d+1; pairing ultra-short strings would
  * need the tiny-side crossJoin pattern of `Similarity`). Output: one row
  * per unordered distinct-name pair with ed in [1, d]:
  * (a_name, b_name, dist, a_cnt, b_cnt), a_name < b_name. */
object EditDistance {

  /** Segment start (0-based) for index `i` of a string of length `len`,
    * partitioned into `m` segments: the first m-rem get floor(len/m)
    * chars, the last rem get one extra. Emitted as a SQL fragment over
    * lambda-bound variables, so both the index and probe sides share one
    * definition. */
  private def startI(len: String, i: String, m: Int): String =
    s"($i * ($len div $m) + greatest(0, $i - ($m - $len % $m)))"

  private def lenI(len: String, i: String, m: Int): String =
    s"(($len div $m) + if($i >= $m - $len % $m, 1, 0))"

  def levSimilarityJoin(df: DataFrame, strCol: String, d: Int): DataFrame = {
    require(d >= 1 && d <= 4, s"edit-distance threshold must be in [1,4], got $d")
    val m = d + 1
    val names = PinnedCache.pin(
      df.where(length(col(strCol)) >= m)
        .groupBy(col(strCol).as("name")).agg(count(lit(1)).as("cnt")))

    // Inverted-index side: (b_name, b_len, segment index, segment text).
    val idx = names.select(col("name").as("b_name"),
        length(col("name")).as("b_len"),
        explode(expr(
          s"""transform(sequence(0, $d), i -> struct(
             |  i as i,
             |  substring(name, ${startI("length(name)", "i", m)} + 1,
             |            ${lenI("length(name)", "i", m)}) as seg))""".stripMargin))
          .as("e"))
      .select(col("b_name"), col("b_len"), col("e.i").as("i"), col("e.seg").as("seg"))

    // Probe side: for every target length lb within +-d (and >= m, else b
    // is unindexable) and every segment index, all substrings of the probe
    // string with that segment's length starting within the +-d shift
    // window. The window can be empty (short probe vs long target) —
    // sequence() DESCENDS on inverted bounds, so the case-guard emits an
    // empty array instead (DEVNOTES #11).
    val sI = startI("lb", "i", m)
    val lI = lenI("lb", "i", m)
    val probe = names.select(col("name").as("a_name"),
        explode(expr(
          s"""flatten(transform(
             |  sequence(greatest(length(name) - $d, $m), length(name) + $d),
             |  lb -> flatten(transform(sequence(0, $d), i ->
             |    transform(
             |      case when least(length(name) - $lI, $sI + $d)
             |             >= greatest(0, $sI - $d)
             |           then sequence(greatest(0, $sI - $d),
             |                         least(length(name) - $lI, $sI + $d))
             |           else cast(array() as array<int>) end,
             |      p -> struct(lb as lb, i as i,
             |                  substring(name, p + 1, $lI) as sub))))))""".stripMargin))
          .as("e"))
      .select(col("a_name"), col("e.lb").as("lb"), col("e.i").as("i"),
        col("e.sub").as("sub"))

    val pairs = probe.join(idx,
        probe("lb") === idx("b_len") && probe("i") === idx("i") &&
          probe("sub") === idx("seg") && probe("a_name") =!= idx("b_name"))
      .select(least(col("a_name"), col("b_name")).as("a_name"),
        greatest(col("a_name"), col("b_name")).as("b_name"))
      .distinct()
      .where(levenshtein(col("a_name"), col("b_name")) <= d)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))

    pairs
      .join(names.select(col("name").as("a_name"), col("cnt").as("a_cnt")), "a_name")
      .join(names.select(col("name").as("b_name"), col("cnt").as("b_cnt")), "b_name")
      .select(col("a_name"), col("b_name"), col("dist"), col("a_cnt"), col("b_cnt"))
  }
}
