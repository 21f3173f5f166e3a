package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("cross-batch duplicate content collapses to first arrival; state respects watermark") {
    val input = MemoryStream[Doc](spark)
    val query = StreamingDedup.dedupStream(input.toDF(), $"text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, t(0), "alpha content"),
        Doc(2, t(10), "beta content"),
        Doc(3, t(20), "alpha content")) // in-batch dup of 1
      query.processAllAvailable()
      input.addData(
        Doc(4, t(30), "alpha content"),  // cross-batch dup of 1, inside watermark
        Doc(5, t(40), "gamma content"))
      query.processAllAvailable()
      val kept = spark.table("dedup_out").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      // exactly ONE of the three "alpha content" docs survives (which of
      // the batch-1 pair is unspecified; the batch-2 dup must lose to
      // carried state), plus both unique docs
      assert(kept.size == 3 && (kept & Set(1L, 3L)).size == 1 && !kept.contains(4L) &&
        Set(2L, 5L).subsetOf(kept), s"got $kept")
    } finally query.stop()
  }
}
