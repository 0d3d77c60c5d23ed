package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural invariants of [[Dedup.dedupConfigAdvisor]] — the properties a
  * curator relies on when reading the table, checked on a synthetic corpus
  * with a known near-dup structure (clusters of progressively perturbed
  * copies plus unique filler):
  *
  *  - ALIGNED-BAND CONTAINMENT: with band b = indices br..br+r-1, an
  *    r = 4 band collision (all four mins equal) implies both nested
  *    r = 2 band collisions, so cand(r=4) ⊆ cand(r=2) and per-cutoff
  *    n_found(r=4) ≤ n_found(r=2) — not just in expectation, per pair;
  *  - monotonicity in the cutoff: n_true_pairs, docs_removed, chars_saved
  *    nonincreasing, n_survivors nondecreasing;
  *  - consistency with [[Dedup.lshRecallAudit]]: the advisor's loosest-
  *    cutoff row at the audit's (numHashes, r) reproduces the audit's
  *    decile totals exactly (same sample, same hash family, same exact
  *    pair list — the advisor IS the audit plus retention/savings);
  *  - the ANALYTIC column (round 11): analytic_recall_ppm reproduces the
  *    fixed-point 1−(1−(t/10⁶)^r)^b chain bit-for-bit (BigInt oracle),
  *    is monotone the right way in t and in r, and the EMPIRICAL recall
  *    sits within binomial noise of the exact per-pair expectation
  *    Σ p(J_pair)/n (of which the analytic value is the J = t floor). */
class DedupAdvisorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 8 clusters of 4 near-copies (progressive tail perturbation) + 20
  // unique docs; unigram similarity within a cluster is high, across ~0
  private lazy val docs = {
    val words = (0 until 400).map(i => s"w$i")
    val rnd = new scala.util.Random(17)
    val rows = (0 until 8).flatMap { c =>
      val core = rnd.shuffle(words).take(30)
      (0 until 4).map { v =>
        val toks = core.dropRight(v) ++ (0 until v).map(j => s"x${c}_${v}_$j")
        (c * 10 + v.toLong, toks.mkString(" "), toks.map(_.length + 1).sum.toLong)
      }
    } ++ (0 until 20).map { u =>
      val toks = rnd.shuffle(words).take(8).map(w => s"u${u}_$w")
      (1000 + u.toLong, toks.mkString(" "), toks.map(_.length + 1).sum.toLong)
    }
    rows.toDF("doc_id", "text", "n_chars")
  }

  private val ts = Seq(500000L, 800000L, 900000L)

  private case class Row11(nTrue: Long, nFound: Long, recall: Option[Long],
      analytic: Long, nSurv: Long, removed: Long, saved: Long)

  private lazy val table =
    Dedup.dedupConfigAdvisor(docs, "text", "doc_id", "n_chars",
        thresholdsPpm = ts, rowsPerBand = Seq(2, 4), numHashes = 16, k = 1)
      .collect().map(r => ((r.getAs[Long]("t_ppm"), r.getAs[Long]("rows_per_band")),
        Row11(r.getAs[Long]("n_true_pairs"), r.getAs[Long]("n_found"),
          Option(r.getAs[java.lang.Long]("recall_ppm")).map(_.longValue),
          r.getAs[Long]("analytic_recall_ppm"),
          r.getAs[Long]("n_survivors"), r.getAs[Long]("docs_removed"),
          r.getAs[Long]("chars_saved"))))
      .toMap

  /** the fixed-point chain, reimplemented independently in BigInt */
  private def analyticOracle(tPpm: Long, bands: Int, r: Int): Long = {
    val M = BigInt(1000000)
    def pow(base: BigInt, n: Int): BigInt =
      (2 to n).foldLeft(base)((acc, _) => (acc * base) / M)
    (M - pow(M - pow(BigInt(tPpm), r), bands)).toLong
  }

  test("aligned-band containment: n_found(r=4) <= n_found(r=2) at every cutoff") {
    for (t <- ts) {
      val r2 = table((t, 2L)); val r4 = table((t, 4L))
      assert(r2.nTrue == r4.nTrue, "ground truth is band-shape independent")
      assert(r4.nFound <= r2.nFound, s"t=$t: r=4 found ${r4.nFound} > r=2 found ${r2.nFound}")
      assert(r2.nFound <= r2.nTrue && r4.nFound >= 0)
    }
  }

  test("cutoff monotonicity: pairs/removed/saved shrink, survivors grow") {
    for (Seq(lo, hi) <- ts.sliding(2)) {
      val l = table((lo, 2L)); val h = table((hi, 2L))
      assert(h.nTrue <= l.nTrue && h.removed <= l.removed
        && h.saved <= l.saved && h.nSurv >= l.nSurv)
    }
    // the synthetic corpus makes every column informative (non-degenerate)
    val r = table((ts.head, 2L))
    assert(r.nTrue > 0 && r.nFound > 0 && r.removed > 0 && r.saved > 0 && r.nSurv > 0)
  }

  test("loosest-cutoff row reproduces lshRecallAudit's decile totals") {
    val audit = Dedup.lshRecallAudit(docs, "text", "doc_id",
        threshold = 0.5, k = 1, numHashes = 16, r = 2)
      .agg(org.apache.spark.sql.functions.sum(col("n_pairs")),
        org.apache.spark.sql.functions.sum(col("n_found")))
      .collect().head
    val r = table((500000L, 2L))
    assert(audit.getLong(0) == r.nTrue && audit.getLong(1) == r.nFound)
  }

  test("analytic_recall_ppm: bit-exact vs an independent BigInt chain; monotone in t and r") {
    for (t <- ts; r <- Seq(2, 4))
      assert(table((t, r.toLong)).analytic == analyticOracle(t, 16 / r, r),
        s"fixed-point chain mismatch at t=$t r=$r")
    // tighter cutoff -> higher collision floor; wider rows -> lower floor
    for (Seq(lo, hi) <- ts.sliding(2); r <- Seq(2L, 4L))
      assert(table((lo, r)).analytic <= table((hi, r)).analytic)
    for (t <- ts)
      assert(table((t, 4L)).analytic <= table((t, 2L)).analytic,
        s"t=$t: r=4 analytic should not exceed r=2's")
    // spot values: t=0.9, r=2, b=8 -> 1-(1-0.81)^8 is well above 3/4;
    // t=0.5, r=4, b=4 -> 1-(1-0.0625)^4 ~ 0.227
    assert(table((900000L, 2L)).analytic > 750000L)
    assert(math.abs(table((500000L, 4L)).analytic - 227000L) < 3000L)
  }

  test("empirical recall matches the exact per-pair expectation within binomial noise") {
    // expectation of the empirical column: mean over TRUE pairs (j >= t)
    // of p(J_pair) = 1-(1-J^r)^b, each evaluated with the same fixed-point
    // chain the analytic column uses at the cutoff. The analytic column is
    // the J = t floor of these terms, so expected >= analytic always.
    val exact = Dedup.prefixJaccardPairs(docs, "text", "doc_id", 0.5, 1)
      .select(org.apache.spark.sql.functions
        .round(col("jaccard") * 1000000).cast("long").as("j_ppm"))
      .collect().map(_.getLong(0)).toSeq
    for (t <- ts; r <- Seq(2, 4)) {
      val row = table((t, r.toLong))
      val ps = exact.filter(_ >= t).map(j => analyticOracle(j, 16 / r, r))
      assert(ps.size.toLong == row.nTrue)
      val expected = ps.sum / ps.size // ppm mean
      assert(row.analytic <= expected, "analytic must floor the expectation")
      // binomial-ish noise band: 5 sigma of independent Bernoullis plus a
      // fixed 40k ppm allowance for the md5 hash family's deviation from
      // ideal permutations and for shared-doc correlation between pairs
      val varSum = ps.map(p => p.toDouble * (1000000.0 - p)).sum
      val sigma = math.sqrt(varSum) / ps.size
      val margin = 5.0 * sigma + 40000.0
      assert(math.abs(row.recall.get - expected) <= margin,
        s"t=$t r=$r: empirical ${row.recall.get} vs expected $expected (margin ${margin.toLong})")
    }
  }
}
