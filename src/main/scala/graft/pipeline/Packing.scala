package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training sequences.
  *
  * The packing discipline is *shard-local chunked next-fit*: documents
  * are bucketed into `nShards` content-addressed shards, ordered
  * deterministically within each shard, and laid end-to-end; a document
  * belongs to the sequence its START offset falls in
  * (`seq_id = floor(start / seqLen)`). This is what production
  * pretraining pipelines actually run — globally optimal bin packing is
  * NP-hard and order-destroying, while next-fit over a hashed shard is
  * one window pass, deterministic under re-runs, and wastes at most one
  * partial sequence per shard.
  *
  * Scale shape: ONE shuffle on the shard key, then a per-shard ordered
  * window (WindowExec spills oversized shards). No driver state, no
  * collect; `nShards` controls packing parallelism independently of the
  * cluster's partition count. All arithmetic (md5 sharding, running
  * sums) is reproducible in external SQL engines — the correctness
  * oracle replays it exactly.
  *
  * Reference scope note: the reference library has no text-pipeline
  * surface; this extends the SURVEY "beyond the reference" operator set
  * alongside [[Curation]] and [[Dedup]].
  */
object Packing {

  /** Per-document sequence assignment: returns the input plus
    * `shard` (content-addressed bucket in [0, nShards)),
    * `tok` (token count clamped to seqLen — an over-long document
    * occupies a full sequence and is truncated downstream), and
    * `seq_id` (the shard-local training sequence index).
    *
    * `tokens` must be a deterministic token-count expression (e.g.
    * [[TextAnalysis.tokenCount]] or a precomputed column).
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
                    seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive; got $seqLen")
    require(nShards > 0, s"nShards must be positive; got $nShards")
    // md5-uniform shard (same content-addressing as Curation.hashSplit):
    // re-runs and corpus refreshes never move a document between shards
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
        .cast("long"), lit(nShards))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("shard", shard)
      .withColumn("tok", least(tokens, lit(seqLen)).cast("long"))
      // exclusive prefix sum = this document's start offset in the
      // shard's token stream
      .withColumn("seq_id",
        floor((sum(col("tok")).over(w) - col("tok")) / lit(seqLen))
          .cast("long"))
  }

  /** Per-sequence roll-up of [[packSequences]]: one row per training
    * sequence with document count, token total, and fill fraction
    * (tokens / seqLen). Under concat-and-chunk accounting a document
    * straddling a boundary is counted in its start sequence, so fill
    * can exceed 1.0 there; the final sequence of a shard is usually
    * partial (< 1.0). */
  def sequenceStats(df: DataFrame, idCol: String, tokens: Column,
                    seqLen: Int, nShards: Int): DataFrame =
    packSequences(df, idCol, tokens, seqLen, nShards)
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
           round(sum(col("tok")) / lit(seqLen.toDouble), 6).as("fill"))

  /** Sliding-window token chunking — the context-window splitter for
    * long-document training/RAG prep: each document yields chunks of up
    * to `chunkSize` tokens starting every `stride` tokens (overlap =
    * chunkSize - stride when stride < chunkSize). Documents with zero
    * tokens yield no chunks.
    *
    * Chunking stops at the first window that reaches the document's
    * end: a start whose window would be a strict suffix of the previous
    * chunk emits nothing (its tokens are already fully covered), so no
    * token is duplicated beyond the intended `chunkSize - stride`
    * overlap.
    *
    * One narrow projection + a generator (`explode(sequence(...))`) —
    * no shuffle, no window: chunk starts depend only on the document's
    * own token count, so this scales embarrassingly (each scan task
    * chunks its own documents). Output: (idCol, chunk_idx, chunk_start,
    * chunk_tokens, is_full).
    */
  def tokenChunks(df: DataFrame, idCol: String, tokens: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive; got $chunkSize")
    require(stride > 0, s"stride must be positive; got $stride")
    // last start = ceil((ntok - chunkSize) / stride) * stride, clamped
    // at 0 — integer arithmetic via floor((n - c + s - 1) / s). The
    // least() bound only binds when stride > chunkSize (disjoint
    // sampling): without it the covering-start formula could land past
    // the document and emit zero/negative-token chunks
    val lastStart = least(
      greatest(lit(0L),
        floor((col("__ntok") - chunkSize + (stride - 1)) /
                lit(stride.toDouble)).cast("long") * stride),
      floor((col("__ntok") - 1) / lit(stride.toDouble)).cast("long") *
        stride)
    df.withColumn("__ntok", tokens.cast("long"))
      .where(col("__ntok") > 0)
      .select(col(idCol),
              col("__ntok"),
              explode(sequence(lit(0L), lastStart,
                               lit(stride.toLong))).as("chunk_start"))
      .select(col(idCol),
              (col("chunk_start") / lit(stride.toLong)).cast("long")
                .as("chunk_idx"),
              col("chunk_start"),
              least(lit(chunkSize.toLong),
                    col("__ntok") - col("chunk_start")).as("chunk_tokens"))
      .withColumn("is_full", col("chunk_tokens") === lit(chunkSize.toLong))
  }
}
