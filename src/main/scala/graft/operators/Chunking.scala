package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Sliding-window document chunking — the retrieval/embedding-prep step
  * that splits each document into fixed-size token windows advancing by a
  * stride (overlap = chunkTokens - stride). Every document yields at least
  * one chunk; the last window may be short. This is the standard RAG /
  * embedding-index chunker (fixed window + overlap, no sentence model).
  *
  * Scale shape: ZERO shuffles — chunk enumeration is a per-row
  * `posexplode` over a computed `sequence`, so the fan-out (≈ n_tokens /
  * stride per doc) happens inside the scan stage and parallelism follows
  * the input partitioning. Nothing here funnels; 100 TB chunks exactly as
  * fast as it scans.
  *
  * Determinism: chunk boundaries are a pure function of (token count,
  * chunkTokens, stride), so the placement replays in any engine — t21's
  * oracle re-derives it in DuckDB with generate_series + list slicing.
  */
object Chunking {

  /** Explode `docs` into (id, chunk_idx, n_chunk_tokens, chunk_text).
    * Chunk i covers tokens [i*stride, i*stride + chunkTokens); the number
    * of chunks is ceil((n - chunkTokens) / stride) + 1, floored at one so
    * empty/short docs still emit their (possibly short) single chunk.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    val nChunks: Column =
      floor((greatest(col("n_tokens") - chunkTokens, lit(0)) + (stride - 1))
        / stride).cast("int") + 1
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("ctoks"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("ctoks")).as("n_chunk_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }
}
