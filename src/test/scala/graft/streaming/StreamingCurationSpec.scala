package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** The curation pipeline (quality gate → dedup → split), run as a
  * STREAM: the same operator columns compose over readStream because
  * every stage is a per-row expression or a watermark-scoped stateful
  * op — nothing batch-only. Batch parity is the assertion: streaming
  * the fixture through must keep exactly the rows the batch pipeline
  * keeps (modulo the in-batch dedup representative, which is
  * unspecified in both modes — parity is therefore checked on
  * fingerprint sets, not doc ids). */
case class CurationDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  private type Doc = CurationDoc
  private val Doc = CurationDoc
  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000)

  private val fixture = Seq(
    Doc(1, t(0), "a solid document with enough words to pass the gate here"),
    Doc(2, t(5), "too short"),                                   // fails gate
    Doc(3, t(10), "a solid document with enough words to pass the gate here"), // dup of 1
    Doc(4, t(15), "another acceptable document with plenty of distinct tokens inside it today"),
    Doc(5, t(20), "third unique passing document carrying sufficiently many words too right now"))

  private def curate(df: org.apache.spark.sql.DataFrame, streaming: Boolean) = {
    val gated = df
      .withColumn("n_tokens",
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= 10)
    val deduped =
      if (streaming) StreamingDedup.dedupStream(gated, col("text"), "ts", "10 minutes")
      else gated.withColumn("fingerprint",
          graft.dedup.IncrementalDedup.fingerprint(col("text")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("fingerprint")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
    graft.operators.DataSplit.withSplit(deduped, col("text"),
      Seq("train" -> 0.8, "val" -> 0.2))
  }

  test("streaming curation keeps exactly the batch pipeline's content") {
    val input = MemoryStream[Doc](spark)
    val query = curate(input.toDF(), streaming = true)
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(3): _*)
      query.processAllAvailable()
      input.addData(fixture.drop(3): _*)
      query.processAllAvailable()
      val stream = spark.table("curated_out")
        .select(col("fingerprint"), col("split"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = curate(fixture.toDF(), streaming = false)
        .select(col("fingerprint"), col("split"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(stream == batch && stream.size == 3,
        s"stream=$stream batch=$batch")
    } finally query.stop()
  }
}
