package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk): pretraining consumes documents
  * as one token stream chunked into fixed-size windows; a document
  * placed at token offset o with n tokens spans windows
  * floor(o/W) .. floor((o+n−1)/W). The operator computes each
  * document's window span — the shuffle-free bookkeeping that drives
  * the actual example writer.
  *
  * Packing is defined by an ORDER. A single corpus-wide order would
  * demand a global sort at 100 TB, so — as production pipelines do —
  * the stream is sharded: documents hash into `shards` independent
  * streams, each packed in (id) order by a windowed cumulative sum.
  * The whole computation is ONE hash exchange (the shard window);
  * shard count scales with the cluster, and the per-shard sort is a
  * local spillable sort, not a range partition.
  *
  * All arithmetic is integer (offsets are exact longs; `div` is floor
  * for the non-negative operands here), so the result is engine-exact.
  */
object Packing {

  /** @param windowTokens tokens per packed window (e.g. 2048/4096)
    * @param shards       independent packing streams
    * @return (doc_id, shard, n_tokens, tok_offset, first_window,
    *         last_window, n_windows); zero-token documents are dropped
    *         (they occupy no window). Window ids are PER SHARD. */
  def packWindows(docs: DataFrame, idCol: Column, nTokensCol: Column,
                  windowTokens: Long, shards: Int): DataFrame = {
    require(windowTokens > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(idCol.cast("long").as("doc_id"),
        nTokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("first_window", expr(s"tok_offset div $windowTokens"))
      .withColumn("last_window",
        expr(s"(tok_offset + n_tokens - 1) div $windowTokens"))
      .withColumn("n_windows", col("last_window") - col("first_window") + 1)
  }
}
