package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence chunking + packing for training-data pipelines: split documents
  * into fixed-token-budget chunks (what a trainer's max sequence length
  * imposes), then assign chunks to contiguous bins per source — the
  * deterministic, distributed approximation of greedy sequence packing.
  *
  * Chunking is pure map work (HOF explode, no shuffle). Packing needs a
  * running token total per group — one shuffle keyed by the group column
  * carrying (group, ids, int) only; bin assignment is
  * `floor(tokens_before / budget)`, a pure function of the running sum, so
  * chunks never reorder and results are engine-independent.
  */
object Packing {

  /** One row per chunk: (doc_id, chunk_id, chunk_tokens, chunk_md5).
    * Chunks are consecutive `maxTokens`-sized token windows; the md5 of the
    * re-joined chunk text makes content equality checkable without
    * shipping the text. Empty docs produce zero chunks (guarded — an
    * unguarded sequence would descend). */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    // tokens hoisted to a named column: HOF lambdas are interpreted and
    // re-evaluate captured outer expressions per element — an inlined
    // split() here costs O(tokens * chunks) per doc instead of O(tokens)
    val toks = col("t")
    // integer ceil-div (Column./ is double division, which sequence rejects)
    val nChunks = expr(s"(size(t) + ${maxTokens - 1}) div $maxTokens").cast("int")
    val chunks = when(size(toks) > 0,
      transform(sequence(lit(0), nChunks - 1), i => struct(
        i.as("chunk_id"),
        least(size(toks) - i * maxTokens, lit(maxTokens)).as("chunk_tokens"),
        md5(concat_ws(" ", slice(toks, i * maxTokens + 1, lit(maxTokens)))).as("chunk_md5"))))
      .otherwise(array().cast("array<struct<chunk_id:int,chunk_tokens:int,chunk_md5:string>>"))
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_id").cast("long").as("chunk_id"),
        col("c.chunk_tokens").cast("long").as("chunk_tokens"), col("c.chunk_md5"))
  }

  /** Overlapping sliding-window chunks — the RAG/retrieval windowing
    * convention (context preserved across chunk boundaries), vs
    * [[chunkTokens]]' disjoint trainer windows. Starts at 0, stride,
    * 2·stride, …; chunk i covers tokens [i·stride, i·stride + window);
    * the chunk count is 1 for docs ≤ window tokens, else
    * ceil((n − window)/stride) + 1 — every token covered, no tail window
    * fully contained in its predecessor. Returns (doc_id, chunk_id,
    * start, chunk_tokens, chunk_md5); map-only (the hoisted-tokens HOF
    * discipline), content equality via md5 without shipping text. */
  def strideChunks(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val toks = col("t")
    val nChunks = expr(
      s"case when size(t) <= $window then 1 else ((size(t) - $window + ${stride - 1}) div $stride) + 1 end")
      .cast("int")
    val chunks = when(size(toks) > 0,
      transform(sequence(lit(0), nChunks - 1), i => struct(
        i.as("chunk_id"),
        (i * stride).as("start"),
        least(size(toks) - i * stride, lit(window)).as("chunk_tokens"),
        md5(concat_ws(" ", slice(toks, i * stride + 1, lit(window)))).as("chunk_md5"))))
      .otherwise(array().cast(
        "array<struct<chunk_id:int,start:int,chunk_tokens:int,chunk_md5:string>>"))
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_id").cast("long").as("chunk_id"),
        col("c.start").cast("long").as("start"),
        col("c.chunk_tokens").cast("long").as("chunk_tokens"), col("c.chunk_md5"))
  }

  /** Greedy in-order packing: chunks fill bins of `budget` tokens per
    * group, in (doc_id, chunk_id) order; a chunk's bin is
    * `floor(tokens_before_it / budget)`. Returns per-bin stats. */
  def packBins(chunks: DataFrame, groupCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("cum", sum(col("chunk_tokens")).over(w))
      // integer `div`, not `/`: Spark's / is double division and a running
      // token total at corpus scale would lose integer precision past 2^53
      .withColumn("bin_id", expr(s"(cum - chunk_tokens) div $budget"))
      .groupBy(groupCol.as("grp"), col("bin_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).cast("long").as("bin_tokens"))
  }

  /** Padding-waste audit for fixed-size training batches: with batch
    * size B, every sequence in a batch pads to the batch max, so
    * waste = Σ_batches (B·max − Σ len) — and the whole point of
    * length-sorted batching is how much that drops vs arrival order.
    * Returns one row per strategy ('arrival' = doc-id order, 'sorted' =
    * (len, doc-id) order): n_batches, tokens, padded_slots, waste_ppm —
    * the % of compute a trainer burns on pad tokens, integer ppm.
    * (The tail batch pads to its own size·max, not B·max — no phantom
    * rows.)
    *
    * Scale note: the global row_number here is the audit-sized
    * formulation (doc-count rows of longs); a production packing run
    * batches per shard ([[graft.ext.Sampling.curriculumShardPlan]]'s
    * per-(phase, shard) windows), where the same waste math applies
    * within each writer partition. */
  def paddingWaste(docs: DataFrame, textCol: String, idCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 2, "batchSize >= 2")
    val base = PinnedCache.pin(docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("len")))
    def audit(strategy: String): DataFrame = {
      base
        .withColumn("batch", expr(s"(row_number() over (order by ${
          if (strategy == "arrival") "doc_id" else "len, doc_id"}) - 1) div $batchSize"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("bn"), max(col("len")).as("mx"), sum(col("len")).as("sm"))
        .agg(count(lit(1)).as("n_batches"), sum(col("sm")).as("tokens"),
          sum(col("bn") * col("mx")).as("padded_slots"))
        .select(lit(strategy).as("strategy"), col("n_batches"), col("tokens"),
          col("padded_slots"),
          expr("((padded_slots - tokens) * 1000000) div padded_slots").as("waste_ppm"))
    }
    audit("arrival").unionByName(audit("sorted"))
  }
}
