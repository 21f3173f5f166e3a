package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record — the reassembly automaton's emission type
  * (field names = the reader's output columns, so `toDF` needs no
  * renames). `content_length` is the HEADER's declared value (None when
  * the header is absent or non-numeric), not the payload's length. */
case class WarcRec(url: String, warc_type: String, warc_date: String,
                   content_type: String, content_length: Option[Long],
                   payload: String, is_valid: Boolean)

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
  * by the spec's blank line.
  *
  * Two read postures, one validity contract. **[[readExact]] is the
  * DEFAULT for payload-bearing WARC** (response/request records —
  * anything whose payload is arbitrary web content): real crawls
  * contain pages that quote WARC headers verbatim, and only the
  * Content-Length-aware walk keeps them. [[read]] is the opt-in for
  * zones that are magic-free BY CONSTRUCTION — WET text extracts,
  * metadata records — where the suspect-flag pass buys nothing:
  *
  *   - [[readExact]] (default) — Content-Length-aware: records whose
  *     payload QUOTES the record magic (archiving specs, WARC
  *     documentation pages — real Common Crawl content) are
  *     reassembled from their fragments by walking each file's chunk
  *     sequence with the header's declared length, exactly as a
  *     sequential spec-compliant reader would. Only files that contain
  *     a suspect fragment pay the reassembly; intact files keep the
  *     map-only parallel parse. Costs one extra pass over the zone's
  *     bytes for the per-file suspect flag (a landing deployment folds
  *     it into the write, like the cdx sidecar).
  *   - [[read]] (opt-in, magic-free zones) — single-pass, fully
  *     chunk-parallel, no suspect pass. A payload that does contain
  *     the version magic splits into fragments — the head fails the
  *     length check, the tail fails the header check — so such records
  *     are dropped but COUNTED, never merged into a neighbor.
  */
object Warc {

  /** Fixed WARC-Date for synthesized zones (no now() anywhere). */
  val DateLit = "2026-08-10T00:00:00Z"
  val UriPrefix = "http://example.org/doc/"

  /** The record magic the zone is split on (also what the lineSep scan
    * consumes — reassembly re-inserts it between fragments). */
  val Magic = "WARC/1.0\r\n"
  private val HdrSep = "\r\n\r\n"

  /** Reassembly borrow cap: a head fragment never pulls more than this
    * many following chunks while chasing its Content-Length. Bounds the
    * automaton's buffering under a corrupt header that declares a
    * gigantic length (the borrow loop would otherwise buffer to EOF);
    * a real payload quoting the magic more than 63 times is past any
    * plausible page. */
  val MaxBorrow = 63

  // deterministic corruption residues for synthesized test zones:
  // %97 → Content-Length overstates the payload by one byte (an
  //       UNCONDITIONAL length mismatch: the earlier truncate-to-half
  //       was a no-op for texts of length ≤ 1, silently diverging from
  //       the oracle's unconditional %97 exclusion — ADVICE r14),
  // %89 → Content-Length header missing entirely
  val TruncMod = 97
  val NoLenMod = 89

  /** %101 → the payload QUOTES the record magic (a VALID record — the
    * real-data shape [[readExact]] exists for: pages that cite WARC
    * headers verbatim). The prefix below is prepended to the document
    * text, Content-Length counts the full quoted payload. */
  val MagicQuoteMod = 101
  val MagicQuotePrefix: String = s"see: $Magic"

  /** One WARC response record per document, with the two corruption
    * modes and the magic-quoting VALID mode injected by doc_id residue
    * (a zone synthesized from the gate corpus therefore carries its own
    * negative cases, like the raw-zone corrupt-file e2e).
    *
    * `url` / `warcType` / `extraHeaders` default to the classic shape
    * (UriPrefix + doc_id, `response`, none) — existing zones stay
    * byte-identical; the r17 mixed zones override them to write
    * robots.txt captures (host-rooted Target-URIs) and `revisit`
    * records carrying `WARC-Refers-To-Target-URI` (ISO 28500 §6.7.2)
    * into the same files as ordinary responses. */
  def recordColumn(docId: Column, text: Column,
                   url: Column = null, warcType: Column = null,
                   extraHeaders: Column = null): Column = {
    val trunc = pmod(docId, lit(TruncMod)) === 0
    val noLen = pmod(docId, lit(NoLenMod)) === 0
    val quotes = pmod(docId, lit(MagicQuoteMod)) === 0
    val written = when(quotes, concat(lit(MagicQuotePrefix), text)).otherwise(text)
    val clenHeader = when(noLen, lit(""))
      .otherwise(concat(lit("Content-Length: "),
        (octet_length(written) + when(trunc, lit(1)).otherwise(lit(0))).cast("string"),
        lit("\r\n")))
    val uri = Option(url).getOrElse(concat(lit(UriPrefix), docId.cast("string")))
    val typ = Option(warcType).getOrElse(lit("response"))
    val extra = Option(extraHeaders).getOrElse(lit(""))
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), typ, lit("\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit(s"WARC-Date: $DateLit\r\n"),
      extra,
      lit("Content-Type: text/plain\r\n"),
      clenHeader,
      lit("\r\n"),
      written, lit("\r\n\r\n"))
  }

  /** Synthesize a WARC zone from `docs` (doc_id, text): `nFiles` files,
    * records grouped by doc_id residue and sorted within each file —
    * fully deterministic. The write is a distributed foreachPartition
    * through the Hadoop FS (the synthesizeRawZone seam), one file per
    * partition; `gzip` writes ONE gzip member PER RECORD concatenated
    * (the real Common Crawl layout — what makes [[WarcGz]]'s member
    * index able to split INSIDE a file; plain whole-file readers still
    * work because both Java's GZIPInputStream and Hadoop's gzip codec
    * decode concatenated members transparently). */
  def synthesize(spark: SparkSession, docs: DataFrame, outDir: String,
                 nFiles: Int = 8, gzip: Boolean = false): Unit = {
    val ext = if (gzip) "warc.gz" else "warc"
    // the SESSION's Hadoop conf, broadcast into the partition closure: a
    // fresh Configuration() would drop defaultFS / S3 credentials /
    // custom FS impls and silently write local-only (ADVICE r14)
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    // file routing: damaged and magic-quoting records CONCENTRATE in
    // file 0; clean records spread over the remaining files. This is
    // both the real-crawl shape (damage is rare — most files are
    // intact) and what keeps BOTH of readExact's branches exercised by
    // every gate zone: files 1..n-1 carry no suspect chunk and take
    // the map-only columnar parse, file 0 takes the reassembly walk
    // (a uniform doc_id % n routing made EVERY file suspect at gate
    // scale, leaving the clean branch gate-dead).
    val special = pmod(col("doc_id"), lit(TruncMod)) === 0 ||
      pmod(col("doc_id"), lit(NoLenMod)) === 0 ||
      pmod(col("doc_id"), lit(MagicQuoteMod)) === 0
    val route = when(special, lit(0))
      .otherwise(pmod(col("doc_id"), lit(math.max(nFiles - 1, 1))) +
        lit(math.min(nFiles - 1, 1)))
    // optional per-record overrides: a docs relation carrying `url` /
    // `warc_type` / `extra_headers` columns writes those instead of the
    // classic UriPrefix+doc_id response shape (r17 mixed zones)
    def opt(name: String): Column =
      if (docs.columns.contains(name)) col(name) else null
    docs
      .select(route.as("__f"), col("doc_id"),
        recordColumn(col("doc_id"), col("text"),
          url = opt("url"), warcType = opt("warc_type"),
          extraHeaders = opt("extra_headers")).as("__r"))
      .repartition(nFiles, col("__f"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("__r"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(f"$outDir/part-$pid%05d.$ext")
          val fs = path.getFileSystem(hconf.value.value)
          val raw = fs.create(path, true)
          try {
            if (gzip) {
              // per-record member: header + deflate + trailer, then the
              // member stream is CLOSED (releasing its native Deflater
              // immediately — one leaked zlib state per record OOM-kills
              // a real-size synthesis) behind a shield that keeps the
              // underlying file stream open for the next member
              // bulk writes must pass through intact: FilterOutputStream's
              // default write(byte[],int,int) forwards BYTE-BY-BYTE through
              // write(int) — a significant slowdown for exactly the
              // real-sized synthesis this path exists for (ADVICE r15)
              val shield = new java.io.FilterOutputStream(raw) {
                override def write(b: Int): Unit = raw.write(b)
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  raw.write(b, off, len)
                override def close(): Unit = flush()
              }
              it.foreach { r =>
                val gz = new java.util.zip.GZIPOutputStream(shield)
                gz.write(r.getString(0).getBytes("UTF-8"))
                gz.close()
              }
            }
            else it.foreach(r => raw.write(r.getString(0).getBytes("UTF-8")))
          } finally raw.close()
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
  def parseChunks(chunks: DataFrame): DataFrame = parseChunksWith(chunks, Nil)

  /** [[parseChunks]] with EXTRA header columns appended — record-type
    * routing needs headers the fixed schema drops (ISO 28500 §6.7.2:
    * a `revisit` record's `WARC-Refers-To-Target-URI` names the
    * earlier capture it deduplicated against). `extra` maps header
    * name → output column, appended AFTER the base schema so existing
    * consumers are position-stable.
    *
    * `repeated` (r19) collects headers that may occur on SEVERAL lines
    * of one record (HTTP lets a field repeat — RFC 9110 §5.2 reads the
    * repetitions as one comma-joined list, and `X-Robots-Tag` uses
    * that in the wild): each name yields an ARRAY column of the
    * per-line values in document order, since `str_to_map` can only
    * keep one. Matching is case-insensitive on the header NAME (§5.1);
    * values come back verbatim. */
  /** The header block with only the FIRST line per (case-insensitive)
    * header name kept — `str_to_map` THROWS on duplicate keys
    * (DUPLICATE_MAP_KEY, default EXCEPTION policy), and HTTP lets a
    * field repeat (the r19 repeated X-Robots-Tag fixture made this
    * real; a quoting payload's text can also collide before its first
    * blank line). First-wins matches [[assemble]]'s map semantics;
    * consumers that need EVERY repetition use `repeated` below.
    *
    * FAST PATH: this sits on every zone read's hot loop, so the
    * quadratic per-line dedupe only runs on records that actually
    * carry a duplicate name — the O(lines) distinct-count check routes
    * the overwhelming majority of records straight through (the first
    * r19 cut deduped unconditionally and read 1.5× on the map-only
    * extraction A/B). */
  private def firstWinsHeaders(headers: Column): Column = {
    val lines = split(headers, "\r\n")
    def name(l: Column) = lower(substring_index(l, ":", 1))
    val names = transform(lines, name(_))
    when(size(names) === size(array_distinct(names)), headers)
      .otherwise(array_join(
        filter(lines, (l, i) =>
          size(filter(slice(lines, lit(1), i), p => name(p) === name(l))) === 0),
        "\r\n"))
  }

  def parseChunksWith(chunks: DataFrame,
                      extra: Seq[(String, String)],
                      repeated: Seq[(String, String)] = Nil): DataFrame = {
    val chunk = col("value")
    // header block = everything before the first blank line; rest =
    // payload + the record-final "\r\n\r\n" (so the payload needs no
    // byte slicing — strip 4 and length-check against the header)
    val headers = substring_index(chunk, "\r\n\r\n", 1)
    val rest = expr(
      raw"substr(value, length(substring_index(value, '\r\n\r\n', 1)) + 5)")
    val hmap = str_to_map(firstWinsHeaders(headers),
      lit("\r\n"), lit(": "))
    val payload = expr(raw"substr(__rest, 1, length(__rest) - 4)")
    val extraCols = extra.map { case (h, a) => col("__h").getItem(h).as(a) }
    val repeatedCols = repeated.map { case (h, a) =>
      val quoted = java.util.regex.Pattern.quote(h)
      regexp_extract_all(col("__hdrs"),
        lit(s"(?mi)^$quoted:[ \\t]*(.*?)[ \\t]*$$"), lit(1)).as(a)
    }
    chunks
      // the zone split at the magic leaves one empty head chunk per file
      .filter(length(chunk) > 0)
      .select(hmap.as("__h"), rest.as("__rest"), chunk.as("__chunk"),
        headers.as("__hdrs"))
      .select(Seq(
        col("__h").getItem("WARC-Target-URI").as("url"),
        col("__h").getItem("WARC-Type").as("warc_type"),
        col("__h").getItem("WARC-Date").as("warc_date"),
        col("__h").getItem("Content-Type").as("content_type"),
        col("__h").getItem("Content-Length").cast("long").as("content_length"),
        payload.as("payload"),
        (col("__h").getItem("WARC-Target-URI").isNotNull &&
          col("__h").getItem("WARC-Type").isNotNull &&
          col("__h").getItem("Content-Length").cast("long").isNotNull &&
          // non-negative guard: 'Content-Length: -4' on a chunk ending at
          // the header blank line yields rest='' so -4 == -4 without it —
          // assemble() rejects the same shape via its terminator check, so
          // the two postures would diverge on crafted input (ADVICE r15)
          col("__h").getItem("Content-Length").cast("long") >= 0 &&
          endswith(col("__chunk"), lit("\r\n\r\n")) &&
          // length check on REST (payload + terminator), not the
          // truncated payload slice: a record cut off exactly at its
          // header blank line ("…Content-Length: 0\r\n\r\n", final
          // terminator missing) has payload "" == CL 0 but rest of 0
          // bytes ≠ CL + 4 — the header separator must not double as
          // the record terminator (found by the assemble-parity review)
          octet_length(col("__rest")) - 4 ===
            col("__h").getItem("Content-Length").cast("long")
          ).as("is_valid")) ++ extraCols ++ repeatedCols: _*)
  }

  /** Record-type-routing read: [[read]]'s schema plus `refers_to`
    * (`WARC-Refers-To-Target-URI` — null on non-revisit records). The
    * URL-dedup chain resolves `revisit` records against the capture
    * they reference instead of treating them as content-bearing pages
    * (VERDICT r16 next #5). */
  def readRouting(spark: SparkSession, path: String): DataFrame =
    parseChunksWith(
      spark.read.option("lineSep", Magic).text(path),
      Seq("WARC-Refers-To-Target-URI" -> "refers_to"))

  /** The curation-facing form: valid records only. */
  def readClean(spark: SparkSession, path: String): DataFrame =
    read(spark, path).filter(col("is_valid")).drop("is_valid")

  // ------------------------------------------------------------------
  // Content-Length-aware exact read (VERDICT r14 wrong #1)
  // ------------------------------------------------------------------

  /** The reassembly automaton: walk one FILE's chunk sequence (the
    * lineSep splits, in file order, WITHOUT the consumed magic) exactly
    * as a sequential spec reader walks the byte stream. For each chunk
    * that parses a numeric Content-Length, if the chunk's own body is
    * shorter than declared, borrow following chunks — re-inserting the
    * 10-byte magic the split consumed — until the declared length is
    * met. An exact hit with the spec terminator emits ONE valid record
    * (the magic-quoting page survives intact); any miss emits the head
    * alone as invalid and REPLAYS the borrowed chunks, so a corrupt
    * header can never swallow its neighbors. Borrowing is capped at
    * [[MaxBorrow]] chunks (memory bound under a lying header).
    *
    * Validity semantics are [[parseChunks]]'s exactly (URI + Type
    * present, byte length equal, terminator present); the ONLY behavior
    * change is that multi-fragment records can now satisfy them. */
  def assemble(chunks: Iterator[String]): Iterator[WarcRec] =
    new scala.collection.AbstractIterator[WarcRec] {
      private val pending = new scala.collection.mutable.ArrayDeque[String]()
      private def hasChunk = pending.nonEmpty || chunks.hasNext
      private def nextChunk(): String =
        if (pending.nonEmpty) pending.removeHead() else chunks.next()
      private def utf8Len(s: String): Long = s.getBytes("UTF-8").length.toLong
      // FIRST occurrence wins on a repeated header name (parity with
      // parseChunks' firstWinsHeaderLines; a bare .toMap was last-wins)
      private def headerMap(h: String): Map[String, String] = {
        val out = Map.newBuilder[String, String]
        val seen = scala.collection.mutable.Set.empty[String]
        h.split("\r\n").foreach { line =>
          val i = line.indexOf(": ")
          if (i >= 0) {
            val name = line.substring(0, i)
            if (seen.add(name.takeWhile(_ != ':').toLowerCase))
              out += name -> line.substring(i + 2)
          }
        }
        out.result()
      }
      // parseChunks parity: payload drops the final 4 chars even on
      // invalid rows (substr with a negative length yields "")
      private def payloadOf(b: String): String =
        b.substring(0, math.max(b.length - 4, 0))
      private def mk(h: Map[String, String], payload: String,
                     cl: Option[Long], valid: Boolean): WarcRec =
        WarcRec(h.getOrElse("WARC-Target-URI", null),
          h.getOrElse("WARC-Type", null), h.getOrElse("WARC-Date", null),
          h.getOrElse("Content-Type", null), cl, payload, valid)

      private var out: WarcRec = _
      private var loaded = false
      private def advance(): Unit = {
        while (!loaded && hasChunk) {
          val c = nextChunk()
          if (c.nonEmpty) {
            val sep = c.indexOf(HdrSep)
            if (sep < 0) { // headerless tail-like chunk
              out = mk(headerMap(c), "", None, valid = false); loaded = true
            } else {
              val h = headerMap(c.substring(0, sep))
              val body0 = c.substring(sep + 4)
              val clOpt = h.get("Content-Length").flatMap(_.toLongOption)
              clOpt match {
                case None =>
                  out = mk(h, payloadOf(body0), None, valid = false); loaded = true
                case Some(cl) =>
                  // running BYTE length instead of re-encoding the whole
                  // accumulator per borrow (utf8 length is additive over
                  // fragments: body0 + Σ(magic + fragment)); fragments
                  // join once on success — O(total bytes), not O(n²)
                  var curBytes = utf8Len(body0)
                  val borrowed = scala.collection.mutable.ArrayBuffer.empty[String]
                  while (curBytes - 4 < cl && hasChunk && borrowed.size < MaxBorrow) {
                    val b = nextChunk(); borrowed += b
                    curBytes += Magic.length + utf8Len(b)
                  }
                  // cl >= 0 mirrors parseChunks' explicit guard (the
                  // terminator check already rejects every negative-CL
                  // shape, but parity is stated, not incidental)
                  val required = h.contains("WARC-Target-URI") &&
                    h.contains("WARC-Type") && cl >= 0
                  val tailChunk = if (borrowed.isEmpty) body0 else borrowed.last
                  if (required && curBytes - 4 == cl && tailChunk.endsWith(HdrSep)) {
                    val cur =
                      if (borrowed.isEmpty) body0
                      else borrowed.mkString(body0 + Magic, Magic, "")
                    out = mk(h, cur.substring(0, cur.length - 4), Some(cl), valid = true)
                  } else {
                    pending.prependAll(borrowed)
                    out = mk(h, payloadOf(body0), Some(cl), valid = false)
                  }
                  loaded = true
              }
            }
          }
        }
      }
      override def hasNext: Boolean = { if (!loaded) advance(); loaded }
      override def next(): WarcRec = {
        if (!hasNext) throw new NoSuchElementException("assemble")
        loaded = false; out
      }
    }

  /** Content-Length-aware batch scan — [[read]]'s schema, but records
    * whose payload quotes the record magic SURVIVE as one valid record.
    *
    * Shape: one offset-keyed delimiter scan (the Hadoop text reader
    * keyed by in-file byte offset — still HDFS-block-splittable for
    * uncompressed zones); a per-FILE flag marks files containing any
    * SUSPECT chunk (declared Content-Length exceeding the chunk's own
    * payload bytes — every reassembly head is suspect by construction,
    * since the split took at least the 10-byte magic). Intact files —
    * the overwhelming majority of a real crawl — keep the map-only
    * columnar parse; only suspect files' chunks shuffle (by file,
    * ordered by offset) into the sequential [[assemble]] walk. At
    * 100 TB the exchange therefore carries the damaged/quoting slice,
    * not the corpus; the suspect-file flag costs one extra pass over
    * the zone's bytes (a crawl-landing deployment would fold it into
    * the landing write, the way Common Crawl ships cdx sidecars). */
  def readExact(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Magic)
    // r19 optimization: size input splits to the CORES, not the file
    // count. The per-byte work downstream of this scan is huge (header
    // parse + HTML string algebra run fused into the scan stage), and
    // zones land as a handful of files, so the default block-size
    // splits pinned the whole chain at file-count parallelism
    // (measured: the q151 parse stage ran 5 tasks / 3.3 s on 32 cores).
    // Scale-adaptive, never a local-only constant: the target is
    // bytes/(4x parallelism) with a 256 KB floor, so at real corpus
    // sizes the computed value exceeds the HDFS block size and Hadoop's
    // split logic keeps block-granularity splits; gzip members stay
    // unsplittable (codec isSplitable=false) exactly as before.
    // TextInputFormat handles records straddling split boundaries for
    // uncompressed input, so the record set is identical.
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val bytes = p.getFileSystem(conf).getContentSummary(p).getLength
      val target = math.max(256L << 10,
        bytes / (4L * spark.sparkContext.defaultParallelism))
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", target)
    } catch { case _: java.io.IOException => () } // unsized path: defaults
    val raw = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text], conf)
    val chunks = raw
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
        org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val file = split
          .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
          .getPath.toString
        // the in-split ordinal breaks offset ties: for COMPRESSED files
        // the reader reports the compressed stream position, which does
        // not advance per record — (offset, idx) is strictly increasing
        // in file order for both postures (a gz file is one split)
        it.zipWithIndex.map { case ((k, v), i) => (file, k.get(), i.toLong, v.toString) }
      }
      .toDF("file", "offset", "idx", "value")
    // empty fragments (two ADJACENT magics in a quoting payload) are NOT
    // filtered here: they contribute their consumed 10-byte magic to the
    // borrow accounting, so dropping them wrongly invalidated a record
    // quoting 'WARC/1.0\r\nWARC/1.0\r\n' (ADVICE r15). assemble skips
    // them as record HEADS; parseChunks filters them on the clean path.

    // Suspect flag via a cheap OVER-approximation (r19 optimization):
    // the old flag rebuilt the first-wins header map and a full payload
    // substring per chunk just to compare ONE number — measured as the
    // single most expensive piece of the suspect pass. A chunk is now
    // suspect when ANY full-line Content-Length value exceeds the
    // chunk's own payload bytes (computed by octet arithmetic — no
    // payload copy). Any-line ≥ the parse-side first-wins value, so
    // every reassembly-needing record still flags (under-flagging is
    // the only correctness hazard); the rare extra flagged file just
    // takes the exact path, which emits identical rows for intact
    // records (the assemble ≡ parseChunks contract, spec'd).
    // restBytes mirrors parseChunks' validity arithmetic EXACTLY:
    // rest = chunk minus headers minus the 4-byte header separator,
    // and the record-final "\r\n\r\n" (4 more bytes) is not payload —
    // so the flag threshold is rest_len - 4, the same margin the old
    // first-wins flag used. Without the second -4 a record truncated
    // 1–4 bytes short of its terminator (the %97 off-by-one corruption
    // class) would slip onto the clean path instead of assemble.
    val hdrsBlock = substring_index(col("value"), HdrSep, 1)
    val restBytes = octet_length(col("value")) - octet_length(hdrsBlock) - lit(8)
    // \+? : cast('+12') parses on the map side, so the superset needs it
    val clAny = array_max(transform(
      regexp_extract_all(hdrsBlock,
        lit("(?mi)^content-length:[ \\t]*\\+?([0-9]+)[ \\t]*\\r?$"), lit(1)),
      v => v.cast("long")))
    val suspect = clAny.isNotNull && (clAny > restBytes)
    val tagged = chunks.withColumn("__susp", suspect)
    val suspFiles = tagged.groupBy(col("file"))
      .agg(max(col("__susp")).as("__s")).filter(col("__s")).select("file")

    val cleanParsed = parseChunks(
      tagged.join(broadcast(suspFiles), Seq("file"), "left_anti").select("value"))
    val dirtyParsed = tagged
      .join(broadcast(suspFiles), Seq("file"), "left_semi")
      .select(col("file"), col("offset"), col("idx"), col("value"))
      .as[(String, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("offset"), col("idx")) { (_, it) =>
        assemble(it.map(_._4))
      }
      .toDF()
      // r19 optimization: spread the reassembled records BEFORE the
      // caller's per-row work. The group walk necessarily runs one task
      // per suspect file, and Spark fuses all downstream map-side
      // algebra (header/HTML/canonicalization chains) into that task —
      // measured as a 3–11 s straggler on every zone query while 31
      // cores idled (suspect records deliberately CONCENTRATE in one
      // file in the synthesized zones; a real crawl's damage clusters
      // the same way). One small exchange of the suspect slice only —
      // the clean majority path is untouched.
      .repartition(spark.sparkContext.defaultParallelism)
    cleanParsed.unionByName(
      dirtyParsed.select(cleanParsed.columns.toIndexedSeq.map(col): _*))
  }

  /** [[readExact]], valid records only. */
  def readExactClean(spark: SparkSession, path: String): DataFrame =
    readExact(spark, path).filter(col("is_valid")).drop("is_valid")

  /** Decode a landed WARC file's bytes to records via the same
    * [[assemble]] automaton. Gzip files decode MEMBER-INCREMENTALLY
    * (VERDICT r15 missing #4): [[WarcGz.memberOffsets]] walks the
    * member boundaries first (constant memory, ~24 B/member of state),
    * then each member's span inflates and assembles ALONE — the
    * decompressed buffer is bounded by ONE member, not the whole file
    * (the old whole-file readAllBytes held the full decompressed zone
    * file, ~compression-ratio × file size). A record never spans gzip
    * members (ISO 28500 / the Common Crawl layout: each member holds
    * whole records), so per-member assembly ≡ the whole-file walk —
    * and a corrupt member now isolates as ONE is_valid=false row
    * (readMembers' contract) instead of truncating the rest of the
    * file's decode. */
  def recordsFromFileBytes(name: String, content: Array[Byte]): Iterator[WarcRec] = {
    if (name.endsWith(".gz")) {
      val members = WarcGz.memberOffsets(new java.io.ByteArrayInputStream(content))
      val invalid = WarcRec(null, null, null, null, None, null, is_valid = false)
      members.flatMap { m =>
        if (!m.ok) Iterator.single(invalid)
        else {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(content, m.offset.toInt, m.length.toInt))
          val bytes = try in.readAllBytes() finally in.close()
          assembleText(new String(bytes, "UTF-8"))
        }
      }
    } else assembleText(new String(content, "UTF-8"))
  }

  private def assembleText(text: String): Iterator[WarcRec] = {
    // empties flow into assemble (adjacent-magic borrow accounting —
    // ADVICE r15); assemble itself skips them as record heads
    assemble(text.split(java.util.regex.Pattern.quote(Magic), -1).iterator)
  }

  /** STREAMING exact ingest: the continuous-crawl posture with
    * [[readExact]]'s semantics. Files land whole (the crawl-landing
    * contract — a member is never appended to), so the `binaryFile`
    * source hands each file's bytes to ONE task and the per-file
    * automaton is exact by construction: micro-batch boundaries fall
    * between files, never inside a record, and the batch oracle checks
    * the stream output verbatim. Task memory holds the file's RAW bytes
    * (the binaryFile contract, ~1 GB for the Common Crawl layout) plus
    * ONE decompressed member — gz decode is member-incremental
    * ([[recordsFromFileBytes]]), no whole-file inflate. */
  def readStreamExact(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the binaryFile source's fixed schema, stated explicitly (streaming
    // sources don't infer)
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => recordsFromFileBytes(p, bytes) }
      .toDF()
  }
}
