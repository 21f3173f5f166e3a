package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Sliding-window token chunking — split documents into overlapping
  * fixed-size token windows (the retrieval/embedding preprocessing stage:
  * every chunk is `size` tokens, consecutive chunks overlap by
  * `size - stride` tokens so no span longer than the overlap is ever cut).
  *
  * Window placement: starts at 0, stride, 2·stride, …; the LAST window is
  * the first one whose end reaches the end of the document, so every token
  * lands in ≥1 chunk and no window starts past the end (the final chunk
  * may be shorter than `size` when the token count isn't stride-aligned).
  * A document shorter than one window yields exactly one (short) chunk.
  *
  * Scale design: map-only — tokenization, window enumeration
  * (`sequence` + `posexplode`) and slicing are all codegen'd expressions;
  * no shuffle, no state, output size ≈ input tokens × (size/stride).
  * Chunk provenance (doc_id, chunk_idx, token_start) is carried so
  * downstream dedup/packing can reassemble or trace chunks.
  */
object Chunking {

  /** All window start offsets for an `n`-token document: 0, stride, …,
    * up to the smallest multiple of `stride` with start + size ≥ n.
    * Exact integer math (non-negative throughout), portable to SQL
    * `generate_series(0, maxStart, stride)`. */
  private def maxStart(n: Column, chunkSize: Int, stride: Int): Column =
    Portable.floorDiv(greatest(n - chunkSize, lit(0)) + (stride - 1), stride) * stride

  /** One row per (doc, window): doc id, chunk index, 0-based token start,
    * token count, and the chunk text re-joined with single spaces. */
  def slidingChunks(df: DataFrame, idCol: String, text: Column,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= size (stride > size would drop tokens)")
    df.select(col(idCol), Portable.tokens(text).as("__toks"))
      .withColumn("__starts",
        sequence(lit(0L), maxStart(size(col("__toks")).cast("long"), chunkSize, stride),
          lit(stride.toLong)))
      // _outer: `__starts` is never empty (sequence from 0 always has ≥1
      // element), and plain posexplode would let InferFiltersFromGenerate
      // push the whole sequence+tokenize expression into an interpreted
      // pre-Generate Filter (the ~70× media-path slowdown of round 5)
      .select(col(idCol), col("__toks"),
        posexplode_outer(col("__starts")).as(Seq("__i", "token_start")))
      .withColumn("chunk", slice(col("__toks"), col("token_start") + 1, lit(chunkSize)))
      .select(col(idCol),
        col("__i").cast("long").as("chunk_idx"),
        col("token_start"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
