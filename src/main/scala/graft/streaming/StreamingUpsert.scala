package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Upsert

/** Streaming CDC compaction — maintain a keyed latest-wins snapshot from
  * a change stream with `foreachBatch`: every micro-batch merges into
  * the current snapshot (operators.Upsert) and publishes a new snapshot
  * version. This is the streaming face of the same merge the batch
  * upsert gate (q80) checks; the upsert laws (CorpusPropertiesSpec)
  * guarantee the final snapshot is independent of how the stream was
  * micro-batched — which is what makes the result exactly
  * oracle-checkable.
  *
  * Snapshot storage ping-pongs between two parquet versions (v0/v1):
  * a batch READS the live version and WRITES the other (never
  * read-modify-write on one path), then flips the pointer — the
  * publish step a real table format does with a transaction log,
  * reduced to its two-version core. At 100 TB each merge is the ONE
  * partial-agg'd shuffle of Upsert.latestWins over snapshot ∪ batch.
  */
class StreamingUpsert(spark: SparkSession, dir: String,
                      keys: Seq[String], version: Seq[String]) {

  @volatile private var live: Option[String] = None

  def snapshotPath: Option[String] = live

  /** The foreachBatch body: merge one micro-batch, publish a version. */
  def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
    val merged = live match {
      case None       => Upsert.compact(batch, keys, version)
      case Some(path) =>
        Upsert.latestWins(spark.read.parquet(path), batch, keys, version)
    }
    val target = s"$dir/v${batchId % 2}"
    merged.write.mode("overwrite").parquet(target)
    live = Some(target)
  }

  /** Current snapshot as a DataFrame (empty-schema error if no batch
    * has ever been published — callers run the stream first). */
  def snapshot(): DataFrame = {
    val path = live.getOrElse(
      throw new IllegalStateException("no snapshot published yet"))
    spark.read.parquet(path)
  }
}
