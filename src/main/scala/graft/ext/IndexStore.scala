package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED-index seam for the ANN/dedup tier (round-13 verdict item 4):
  * at 100 TB the IVF inverted lists and the MinHash signatures are built
  * ONCE per corpus snapshot and reused across every downstream query —
  * rebuilding them inline re-pays the dominant corpus scan + shuffle on
  * each run. Indexes are plain parquet tables (the `sources/v2` replay
  * connector discipline: durable artifacts any engine — Spark, DuckDB,
  * the oracle — can open), written with an overwrite contract so a
  * nightly rebuild is idempotent.
  *
  * Layout under an index root:
  *   centroids/  (cid long, cv array<float>, cnrm double)
  *   invlists/   cid=<k>/ (nid long, v_nid array<float>, nrm_nid double)
  *   sigs/       (doc_id long, m0..m{H-1} long)     — portable md5 MinHash
  *   shingles/   (doc_id long, s array<string>)     — the exact-verify payload
  *
  * `invlists` is PARTITIONED BY cid: an nprobe-probe query reads only
  * nprobe/numCentroids of the corpus payload from disk — partition
  * pruning does at the storage layer what the broadcast probe join does
  * at the compute layer (IndexStoreSpec pins the pruned-scan plan).
  *
  * BIT-IDENTITY contract: the from-index serving paths reuse the SAME
  * assignment/banding/verify expressions as the inline operators
  * ([[Similarity.ivfAssign]]/[[Similarity.ivfRank]],
  * [[Dedup.bandCandidates]]), and float/double/long columns round-trip
  * parquet exactly — so build→write→read→query ≡ the inline build,
  * bit for bit (IndexStoreSpec + the q351/q352 oracles). */
object IndexStore {

  // ---------------------------------------------------------------- IVF

  /** Build and persist an IVF index: the centroid table plus the corpus
    * assigned to its nearest centroid (vector payload + precomputed norm
    * riding along, so serving never rescans the corpus). */
  def writeIvfIndex(path: String, cents: Seq[(Long, Seq[Float], Double)],
      corpus: DataFrame, vecCol: String, idCol: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toDF("cid", "cv", "cnrm")
      .repartition(1) // model-sized: centroids are one small file
      .write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.ivfAssign(cents, corpus, vecCol, idCol, "nid", topn = 1)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/invlists")
  }

  /** The persisted centroid set, driver-side — model state for
    * [[Similarity.ivfAssign]] probe literals (tiny by construction). */
  def readIvfCentroids(spark: SparkSession, path: String): Seq[(Long, Seq[Float], Double)] =
    spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("cv"), col("cnrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1)

  /** Serve cosine top-k from a PERSISTED IVF index: probes assign against
    * the stored centroids (per-row literal expression, zero shuffle), the
    * list join reads only the probed cid partitions (partition pruning),
    * and the re-rank is [[Similarity.ivfRank]] verbatim — bit-identical
    * to [[Similarity.ivfTopKWith]] over the same corpus and centroids. */
  def ivfTopKFromIndex(spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val lists = spark.read.parquet(s"$path/invlists")
      .select(col("cid").cast("long").as("cid"), col("nid"),
        col("v_nid"), col("nrm_nid"))
    Similarity.ivfRank(lists,
      Similarity.ivfAssign(cents, queries, vecCol, idCol, "qid", nprobe),
      k, broadcastProbes)
  }

  /** Append NEW vectors to a persisted IVF index under FROZEN centroids —
    * the standard IVF maintenance contract (lists grow nightly; the
    * coarse quantizer is retrained only on snapshot rebuilds, because
    * moving a centroid invalidates every list). Assignment is the same
    * per-row expression as the build ([[Similarity.ivfAssign]] against
    * the STORED centroid table), so append ≡ full rebuild bit-identically
    * as long as the centroid table is unchanged — and the delta path
    * scans ONLY the new rows: existing list files are never read or
    * rewritten (parquet append adds files inside the touched cid
    * partitions; IndexStoreSpec pins base files byte-untouched). */
  def appendToIvfIndex(path: String, newCorpus: DataFrame, vecCol: String,
      idCol: String): Unit = {
    val cents = readIvfCentroids(newCorpus.sparkSession, path)
    Similarity.ivfAssign(cents, newCorpus, vecCol, idCol, "nid", topn = 1)
      .write.mode("append").partitionBy("cid").parquet(s"$path/invlists")
  }

  /** IVF index HEALTH from a persisted index: per-list sizes, corpus
    * share, and an over-target flag (list > 2× the balanced share) —
    * the maintenance readout that decides when appends have skewed the
    * lists enough to warrant a centroid retrain/split. Reads ONLY the
    * `cid` PARTITION column of the inverted lists, so on a 100 TB index
    * this touches directory metadata plus row counts, never vector
    * payloads (column pruning on a partition column reads zero data
    * pages). Integer-exact shares; output ordered by cid.
    * Output: (cid, n, share_ppm, over_target). */
  def ivfIndexHealth(spark: SparkSession, path: String): DataFrame = {
    val nCents = readIvfCentroids(spark, path).size.toLong
    val perList = spark.read.parquet(s"$path/invlists")
      .select(col("cid").cast("long").as("cid"))
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val total = perList.agg(coalesce(sum(col("n")), lit(0L)).as("total"))
    perList.crossJoin(broadcast(total))
      .select(col("cid"), col("n"),
        expr("(cast(n as decimal(38,0)) * 1000000) div total").as("share_ppm"),
        (col("n") * nCents > lit(2L) * col("total")).as("over_target"))
      .orderBy(col("cid"))
  }

  // ------------------------------------------------------------ MinHash

  /** Build and persist a MinHash index over k-shingle STRING sets: the
    * portable md5-family signatures (one m$i column per hash — the
    * oracle-replayable family, [[Dedup.portableMinhashSigs]]) plus the
    * shingle sets themselves, which the exact-verify stage reads instead
    * of re-shingling the corpus. */
  def writeMinhashIndex(path: String, docs: DataFrame, textCol: String,
      idCol: String, numHashes: Int, k: Int): Unit = {
    val shingles = Dedup.shingleSets(docs, textCol, idCol, k)
      .localCheckpoint(true) // shared by sigs and the persisted payload
    Dedup.portableMinhashSigs(shingles, numHashes)
      .write.mode("overwrite").parquet(s"$path/sigs")
    shingles.write.mode("overwrite").parquet(s"$path/shingles")
  }

  /** Append NEW documents to a persisted MinHash index. Shingling and
    * signatures are ROW-LOCAL (each doc's m$i depend only on its own
    * text), so appending the delta's rows yields an index bit-identical
    * to a full rebuild over base ∪ delta — the nightly path shingles and
    * hashes ONLY the delta; existing sig/shingle files are never read or
    * rewritten. This is the 100 TB asymmetry the persisted seam exists
    * for: corpus-scan cost ∝ delta, serving cost unchanged. */
  def appendToMinhashIndex(path: String, newDocs: DataFrame, textCol: String,
      idCol: String, numHashes: Int, k: Int): Unit = {
    val shingles = Dedup.shingleSets(newDocs, textCol, idCol, k)
      .localCheckpoint(true)
    Dedup.portableMinhashSigs(shingles, numHashes)
      .write.mode("append").parquet(s"$path/sigs")
    shingles.write.mode("append").parquet(s"$path/shingles")
  }

  /** Near-dup pairs answered ENTIRELY from a persisted MinHash index:
    * banded candidates from the stored signatures
    * ([[Dedup.bandCandidates]] verbatim), exact Jaccard verify from the
    * stored shingle sets — the corpus text is never read. Bit-identical
    * to the inline build over the same docs/k/numHashes/r. */
  def minhashPairsFromIndex(spark: SparkSession, path: String,
      numHashes: Int, r: Int, threshold: Double): DataFrame = {
    val sigs = spark.read.parquet(s"$path/sigs")
    val sh = spark.read.parquet(s"$path/shingles")
    Dedup.bandCandidates(sigs, numHashes, r)
      .join(sh.select(col("doc_id").as("a_id"), col("s").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("s").as("sb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }
}
