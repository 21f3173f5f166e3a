package graft.sources

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** WARC source semantics: round trip, per-record corrupt isolation
  * (truncated payload, missing Content-Length), gzip members, and
  * payloads that contain the record magic. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  // ids chosen around the corruption residues: 97·1 length-mismatched
  // (header overstates by one byte — unconditional, so even the empty
  // doc 0 corrupts), 89·1 missing Content-Length, 0 both, rest clean
  private val docs = Seq(
    0L -> "both modes hit this doc",
    1L -> "plain clean document one",
    2L -> "",
    89L -> "this one loses its content length header",
    97L -> "this one gets a Content-Length overstating its payload",
    100L -> "ünïcødé payload — octet length ≠ char length here")

  private def zone(gzip: Boolean = false): String = {
    val dir = scratchDir("warc").toString
    Warc.synthesize(spark, docs.toDF("doc_id", "text"), dir,
      nFiles = 2, gzip = gzip)
    dir
  }

  test("round trip: clean records survive with exact payloads; corrupt ones drop alone") {
    val out = Warc.readClean(spark, zone())
      .select(col("url"), col("payload"), col("content_length")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expected = docs.filter { case (id, _) => id % 97 != 0 && id % 89 != 0 }
      .map { case (id, t) =>
        (s"${Warc.UriPrefix}$id", t, t.getBytes("UTF-8").length.toLong) }.toSet
    assert(out == expected)
  }

  test("read() flags exactly the corrupt records, with parsed fields intact") {
    val rows = Warc.read(spark, zone())
      .select(col("url"), col("is_valid")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows.size == docs.size, "every record surfaces, valid or not")
    for ((id, _) <- docs)
      assert(rows(s"${Warc.UriPrefix}$id") == (id % 97 != 0 && id % 89 != 0),
        s"validity wrong for doc $id")
  }

  test("gzip members parse identically") {
    val plain = Warc.readClean(spark, zone()).select("url", "payload")
    val gz = Warc.readClean(spark, zone(gzip = true)).select("url", "payload")
    assert(plain.except(gz).count() == 0 && gz.except(plain).count() == 0)
  }

  test("streaming ingest ≡ batch scan on the same zone (incremental discovery, same parse)") {
    val dir = zone()
    val batch = Warc.readClean(spark, dir).select("url", "payload")
    val streamed = {
      val chunks = spark.readStream
        .option("lineSep", "WARC/1.0\r\n").option("maxFilesPerTrigger", "1")
        .text(dir)
      val q = Warc.parseChunks(chunks).filter(col("is_valid"))
        .select("url", "payload")
        .writeStream.format("memory").queryName("warc_stream_spec")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("warc_stream_spec")
    }
    assert(batch.except(streamed).count() == 0 &&
      streamed.except(batch).count() == 0)
  }

  test("a payload containing the record magic splits into two INVALID fragments; neighbors survive") {
    val dir = scratchDir("warc").toString
    val evil = Seq(
      1L -> "clean before",
      2L -> "evil WARC/1.0\r\n injected magic inside a payload",
      3L -> "clean after")
    Warc.synthesize(spark, evil.toDF("doc_id", "text"), dir, nFiles = 1)
    val all = Warc.read(spark, dir)
    assert(all.filter(col("is_valid")).select("url").as[String].collect().toSet ==
      Set(s"${Warc.UriPrefix}1", s"${Warc.UriPrefix}3"),
      "the damaged record must drop alone")
    // the split produces one length-mismatched head and one headerless tail
    assert(all.filter(!col("is_valid")).count() == 2)
  }
}
