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

  // the live-version POINTER is durable (a one-line marker file
  // committed after each publish): a restarted query — new JVM, new
  // sink instance — resumes from the accumulated snapshot instead of
  // silently compacting only the replayed batch over it
  private val marker = new java.io.File(dir, "_LIVE")

  @volatile private var live: Option[String] = {
    if (marker.isFile)
      Some(new String(java.nio.file.Files.readAllBytes(marker.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim)
        .filter(p => new java.io.File(p).exists)
    else None
  }

  def snapshotPath: Option[String] = live

  /** The foreachBatch body: merge one micro-batch, publish a version.
    * The write target is always the version that is NOT live (never
    * batchId parity — a replayed/resumed id could otherwise overwrite
    * the very path the merge is lazily reading). */
  def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
    val merged = live match {
      case None       => Upsert.compact(batch, keys, version)
      case Some(path) =>
        Upsert.latestWins(spark.read.parquet(path), batch, keys, version)
    }
    val target =
      if (live.contains(s"$dir/v0")) s"$dir/v1" else s"$dir/v0"
    merged.write.mode("overwrite").parquet(target)
    // ATOMIC pointer publish (temp + rename): a crash mid-write must
    // not leave a truncated marker that silently resets the snapshot —
    // the exact loss the marker exists to prevent
    val tmp = new java.io.File(dir, "_LIVE.tmp").toPath
    java.nio.file.Files.write(tmp,
      target.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try java.nio.file.Files.move(tmp, marker.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // mounts without atomic rename (some NFS/FUSE): degrade to a
      // plain replace — less crash-safe, but the pipeline keeps running
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, marker.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
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
