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
  *    pair list — the advisor IS the audit plus retention/savings). */
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

  private lazy val table =
    Dedup.dedupConfigAdvisor(docs, "text", "doc_id", "n_chars",
        thresholdsPpm = ts, rowsPerBand = Seq(2, 4), numHashes = 16, k = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap // (t, r) -> (n_true, n_found, n_surv, docs_removed, chars_saved)

  test("aligned-band containment: n_found(r=4) <= n_found(r=2) at every cutoff") {
    for (t <- ts) {
      val (nt2, nf2, _, _, _) = table((t, 2L))
      val (nt4, nf4, _, _, _) = table((t, 4L))
      assert(nt2 == nt4, "ground truth is band-shape independent")
      assert(nf4 <= nf2, s"t=$t: r=4 found $nf4 > r=2 found $nf2")
      assert(nf2 <= nt2 && nf4 >= 0)
    }
  }

  test("cutoff monotonicity: pairs/removed/saved shrink, survivors grow") {
    for (Seq(lo, hi) <- ts.sliding(2)) {
      val (ntL, _, nsL, drL, csL) = table((lo, 2L))
      val (ntH, _, nsH, drH, csH) = table((hi, 2L))
      assert(ntH <= ntL && drH <= drL && csH <= csL && nsH >= nsL)
    }
    // the synthetic corpus makes every column informative (non-degenerate)
    val (nt, nf, ns, dr, cs) = table((ts.head, 2L))
    assert(nt > 0 && nf > 0 && dr > 0 && cs > 0 && ns > 0)
  }

  test("loosest-cutoff row reproduces lshRecallAudit's decile totals") {
    val audit = Dedup.lshRecallAudit(docs, "text", "doc_id",
        threshold = 0.5, k = 1, numHashes = 16, r = 2)
      .agg(org.apache.spark.sql.functions.sum(col("n_pairs")),
        org.apache.spark.sql.functions.sum(col("n_found")))
      .collect().head
    val (nt, nf, _, _, _) = table((500000L, 2L))
    assert(audit.getLong(0) == nt && audit.getLong(1) == nf)
  }
}
