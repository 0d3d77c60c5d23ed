package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** IVF-flat ANN units (q43's engine): measured recall gate vs brute force
  * plus degenerate-parameter behavior. */
class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ivfTopK recall@3 vs bruteForceTopK at sf0.01: floor at nprobe=2, monotone in nprobe") {
    // IVF with untrained centroids (lowest-id vectors) and nprobe=2 of 16
    // probes ~1/8 of the corpus per query; on UNCLUSTERED synthetic
    // embeddings that is close to the worst case for IVF (measured ~0.56),
    // so the gate pins a 0.5 floor plus the property that buying more
    // probes buys recall. Real embedding corpora cluster, which is the
    // regime IVF exists for.
    val e = emb("sf0.01")
    val queries = e.where(col("vec_id") < 50)
    val brute = topSet(Similarity.bruteForceTopK(e, queries, "embedding", "vec_id", 3))
    def recallAt(nprobe: Int) = {
      val ivf = topSet(Similarity.ivfTopK(e, queries, "embedding", "vec_id", 3, 16, nprobe))
      (ivf intersect brute).size.toDouble / brute.size
    }
    val r2 = recallAt(2)
    val r6 = recallAt(6)
    info(f"ivfTopK recall@3: nprobe=2 -> $r2%.3f, nprobe=6 -> $r6%.3f")
    assert(r2 >= 0.5, f"recall@3 $r2%.3f below the 0.5 floor at nprobe=2")
    assert(r6 > r2, "more probes must not lose recall")
    assert(r6 >= 0.75, f"recall@3 $r6%.3f below 0.75 at nprobe=6 (measured 0.793)")
  }

  test("raising nprobe to numCentroids makes IVF exact") {
    val e = emb("sf0.001")
    val queries = e.where(col("vec_id") < 20)
    val brute = topSet(Similarity.bruteForceTopK(e, queries, "embedding", "vec_id", 3))
    val full = topSet(Similarity.ivfTopK(e, queries, "embedding", "vec_id", 3, 8, 8))
    assert(full == brute, "nprobe == numCentroids must scan every list")
  }

  test("trainCentroids improves the spherical objective and serves through ivfTopKWith") {
    import org.apache.spark.sql.DataFrame
    val e = emb("sf0.001")
    val init = Similarity.trainCentroids(e, "embedding", k = 8, iters = 0)
    val trained = Similarity.trainCentroids(e, "embedding", k = 8, iters = 4)
    val q0 = Similarity.assignmentQuality(e, "embedding", init)
    val q4 = Similarity.assignmentQuality(e, "embedding", trained)
    info(f"avg cosine to assigned centroid: init $q0%.4f -> trained $q4%.4f")
    assert(q4 >= q0 - 1e-9, "Lloyd iterations must not worsen the objective")
    // trained centroids serve: full-probe IVF over them is exact
    val queries = e.where(col("vec_id") < 10)
    def topSet(df: DataFrame) =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(e, queries, "embedding", "vec_id", 3))
    val served = topSet(Similarity.ivfTopKWith(trained, e, queries, "embedding",
      "vec_id", k = 3, nprobe = 8))
    assert(served == brute)
  }

  test("degenerate parameters: nprobe > centroids and k > corpus do not fail") {
    val e = emb("sf0.001")
    val out = Similarity.ivfTopK(e, e.where(col("vec_id") < 2), "embedding",
      "vec_id", k = 10000, numCentroids = 4, nprobe = 99)
    // every non-self neighbor for both queries, no duplicates
    assert(out.count() == 2 * (e.count() - 1))
    assert(out.dropDuplicates("qid", "nid").count() == out.count())
  }
}
