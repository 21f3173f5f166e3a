package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingestion-side twin of the batch
  * dedup stack (dedup/): drop documents whose content fingerprint was
  * already seen, keeping state only as long as the watermark requires.
  *
  * Built on `dropDuplicatesWithinWatermark`: state per distinct
  * fingerprint is evicted once the watermark passes it, so memory is
  * bounded by (arrival rate × watermark window), not by corpus size —
  * the property that makes exact dedup viable on an unbounded stream.
  * Cross-day/global dedup composes with the batch side: periodically
  * fold retained docs into the IncrementalDedup signature store and
  * probe new batches against it.
  */
object StreamingDedup {

  /** @param eventTime event-time column (TimestampType) the watermark
    *                  rides on; duplicates arriving within `watermark`
    *                  of each other collapse to ONE representative
    *                  (which one is unspecified inside a micro-batch —
    *                  rows there carry no order; across batches the
    *                  earlier batch's survivor wins). */
  def dedupStream(docs: DataFrame, textCol: Column, eventTime: String,
                  watermark: String): DataFrame =
    docs
      .withColumn("fingerprint", graft.dedup.IncrementalDedup.fingerprint(textCol))
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
