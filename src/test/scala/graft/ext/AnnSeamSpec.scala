package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ext.Similarity.AnnParams

/** The ANN candidate seam (`Similarity.topKCandidates`): proves the
  * "at scale the candidate stage swaps to ANN" claim is an EXECUTED path, not a
  * comment — the brute-stage consumers (q192 mutual-kNN, q145 MMR) produce
  * BIT-IDENTICAL output with ANN candidates at the gate sfs under the
  * pinned strong configuration, the IVF machinery is lossless when probing
  * every list, and recall at sf0.1 (where misses first appear) is gated.
  * The q30 RhpSigSpec discipline applied to the consumers. */
class AnnSeamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")

  /** The configuration whose candidate sets contain the true top-1/top-m
    * on the template corpus at the gate sfs (probed, then pinned here). */
  private val Strong = AnnParams(tables = 8, bits = 4, nprobe = 5)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("mutual-kNN with multiprobe candidates is bit-identical to brute at the gate sfs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = emb(sf)
      val brute = rows(Similarity.mutualKnn(e, "embedding", "vec_id", "brute"))
      PinnedCache.releaseAll()
      val ann = rows(Similarity.mutualKnn(e, "embedding", "vec_id", "multiprobe", Strong))
      PinnedCache.releaseAll()
      assert(brute.nonEmpty && ann == brute,
        s"$sf: multiprobe candidates must reproduce the brute reciprocal pairs exactly")
    }
  }

  test("MMR with multiprobe stage-1 candidates is bit-identical to brute at the gate sfs") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = emb(sf)
      val q = e.where(col("vec_id") < 10)
      val brute = rows(Similarity.mmrTopK(e, q, "embedding", "vec_id", 8, 4))
      PinnedCache.releaseAll()
      val ann = rows(Similarity.mmrTopK(e, q, "embedding", "vec_id", 8, 4, 0.7,
        "multiprobe", Strong))
      PinnedCache.releaseAll()
      assert(brute.size == 40 && ann == brute,
        s"$sf: multiprobe stage-1 must reproduce the brute MMR selection exactly")
    }
  }

  test("IVF inverted lists are lossless under a complete probe schedule") {
    // probing all numCentroids lists makes the candidate set the whole
    // corpus BY CONSTRUCTION — so any output difference vs brute would be
    // a bug in the inverted-list machinery itself (partitioning propriety,
    // the (qid,nid) uniqueness argument, tie rules), not a recall miss
    val e = emb("sf0.001")
    val brute = rows(Similarity.mutualKnn(e, "embedding", "vec_id", "brute"))
    PinnedCache.releaseAll()
    val ivf = rows(Similarity.mutualKnn(e, "embedding", "vec_id", "ivf",
      AnnParams(numCentroids = 8, nprobe = 8)))
    PinnedCache.releaseAll()
    assert(ivf == brute, "complete-probe IVF must equal the exhaustive scan")
  }

  test("hard negatives via oversampled ANN candidates reproduce brute at the gate sfs") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the q256 scaladoc's "enlarged m + label filter" swap, executed —
    // with its measured physics. A top-16 cut is NOT enough (label-
    // clustered corpora put many same-label vectors ahead of the nearest
    // negatives), so the swap keeps the candidate stage DEEP (m = 200 ≈
    // the whole bucket-collision set) and label-filters BEFORE the rank
    // cut. Even then a few hard negatives are genuine LSH misses: they
    // sit at MID-cosine (~0.3), where bucket-collision probability
    // decays steeply — unlike near-dup/top-1 workloads, hard-negative
    // mining stresses ANN recall at depth. Measured 0.9967 at sf0.001 and
    // 0.9873 at sf0.01 under the strong config; the gate pins >= 0.98,
    // and equality would need ~4x the tables — the documented trade.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = emb(sf).withColumn("label", col("label").cast("long"))
      val brute = rows(Similarity.hardNegatives(e, "embedding", "vec_id", "label", 3))
      PinnedCache.releaseAll()
      val labels = e.select(col("vec_id"), col("label"))
      val ann = Similarity.topKCandidates(e, e, "embedding", "vec_id", 200,
          "multiprobe", selfSet = true, Strong)
        .join(labels.select(col("vec_id").as("qid"), col("label")), "qid")
        .join(labels.select(col("vec_id").as("nid"), col("label").as("neg_label")), "nid")
        .where(col("label") =!= col("neg_label"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
        .where(col("rk") <= 3)
        .select(col("qid"), col("label"), col("nid"), col("neg_label"),
          col("sim"), col("rk"))
      val got = rows(ann)
      PinnedCache.releaseAll()
      val missedN = (brute -- got).size
      val recall = (brute.size - missedN).toDouble / brute.size
      assert(brute.size == 1500, s"$sf: degenerate ground truth ${brute.size}")
      assert(recall >= 0.98,
        f"$sf: ANN hard-negative recall $recall%.4f below the 0.98 gate ($missedN missed)")
    }
  }

  test("recall gate at sf0.1: multiprobe mutual-kNN pair recall >= 0.97") {
    val e = emb("sf0.1")
    def pairs(df: DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.mutualKnn(e, "embedding", "vec_id", "brute"))
    PinnedCache.releaseAll()
    val ann = pairs(Similarity.mutualKnn(e, "embedding", "vec_id", "multiprobe",
      AnnParams(tables = 8, bits = 5, nprobe = 6)))
    PinnedCache.releaseAll()
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(brute.size > 400, s"degenerate ground truth: ${brute.size} pairs")
    assert(recall >= 0.97, f"pair recall $recall%.3f below the 0.97 gate " +
      f"(measured 0.994 on the round-7 corpus)")
  }
}
