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
    // doc 0 is also %101 (magic-quoting): under the chunk-parallel read
    // it splits into a head (counted under its url) and a headerless
    // tail (null url) — the extra surfaced fragment
    assert(rows.size == docs.size + 1, "every record surfaces, valid or not")
    assert(rows.contains(null), "doc 0's tail fragment surfaces under a null url")
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

  test("a record truncated AT its header blank line is invalid in both read postures") {
    // '…Content-Length: 0\r\n\r\n' with the payload terminator missing:
    // the header separator must not double as the record terminator
    // (parseChunks previously admitted it — review finding)
    val dir = scratchDir("warc").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new org.apache.hadoop.fs.Path(s"$dir/part-00000.warc")
    val goodEmpty = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: ${Warc.UriPrefix}7\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: ${Warc.UriPrefix}8\r\nContent-Length: 0\r\n\r\n"
    val out = fs.create(f, true)
    try out.write((goodEmpty + truncated).getBytes("UTF-8")) finally out.close()
    for (df <- Seq(Warc.read(spark, dir), Warc.readExact(spark, dir))) {
      val validity = df.select(col("url"), col("is_valid"))
        .as[(String, Boolean)].collect().toMap
      assert(validity(s"${Warc.UriPrefix}7"), "well-formed empty record is valid")
      assert(!validity(s"${Warc.UriPrefix}8"), "truncated record must be invalid")
    }
  }

  // ---------------------------------------------- Content-Length-aware

  test("readExact: a magic-quoting payload round-trips VALID, reassembled verbatim") {
    val dir = scratchDir("warc").toString
    val quoted = s"spec says each record begins ${Warc.Magic}then continues"
    val docs2 = Seq(
      1L -> "clean before",
      2L -> quoted,
      3L -> "clean after",
      97L -> "corrupt stays corrupt",
      89L -> "still headerless")
    Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 1)
    val out = Warc.readExact(spark, dir)
    val valid = out.filter(col("is_valid"))
      .select("url", "payload").as[(String, String)].collect().toMap
    assert(valid == Map(
      s"${Warc.UriPrefix}1" -> "clean before",
      s"${Warc.UriPrefix}2" -> quoted,
      s"${Warc.UriPrefix}3" -> "clean after"),
      "the quoting record must survive with its exact payload; corrupt ones must not")
    // corrupt records still isolate: one length-mismatch head, one no-CL
    assert(out.filter(!col("is_valid")).count() == 2)
  }

  test("readExact: multiple quotes in one payload reassemble across several fragments") {
    val dir = scratchDir("warc").toString
    val m = Warc.Magic
    val docs2 = Seq(
      5L -> s"a${m}b${m}c${m}d",
      6L -> "plain neighbor")
    Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 1)
    val valid = Warc.readExactClean(spark, dir)
      .select("url", "payload").as[(String, String)].collect().toMap
    assert(valid == Map(
      s"${Warc.UriPrefix}5" -> s"a${m}b${m}c${m}d",
      s"${Warc.UriPrefix}6" -> "plain neighbor"))
  }

  test("readExact ≡ read on zones without magic-quoting payloads") {
    val dir = zone()
    val a = Warc.read(spark, dir)
    val b = Warc.readExact(spark, dir)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0,
      "on intact zones the exact reader must be a drop-in for the parallel one")
  }

  test("readExact: a corrupt overstating header cannot swallow its neighbor") {
    // %97 doc following by a clean doc in the SAME file: the head's
    // Content-Length points one byte past its payload; the borrow
    // overshoots, is pushed back, and the neighbor parses on its own
    val dir = scratchDir("warc").toString
    val docs2 = Seq(97L -> "liar header", 98L -> "innocent neighbor")
    Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 1)
    val out = Warc.readExact(spark, dir)
    assert(out.filter(col("is_valid")).select("url").as[String].collect().toSeq ==
      Seq(s"${Warc.UriPrefix}98"))
    assert(out.filter(!col("is_valid")).select("url").as[String].collect().toSeq ==
      Seq(s"${Warc.UriPrefix}97"))
  }

  test("readExact reassembles across INPUT-SPLIT boundaries (multi-split single file)") {
    // one uncompressed file, forced to span many Hadoop splits: the
    // (offset, idx) ordering must reconstruct file order across splits,
    // and a fragment pair that happens to straddle a split boundary
    // must still reassemble (the head's borrowed chunk is the first
    // record of the next split)
    val dir = scratchDir("warc").toString
    val docs2 = (0L until 2000L).map { i =>
      i -> (if (i % 101 == 0) s"quote ${Warc.Magic}tail of $i body" + ("x" * 50)
            else s"doc $i body " + ("y" * 60))
    }
    Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 1)
    val hconf = spark.sparkContext.hadoopConfiguration
    val prev = hconf.get("mapreduce.input.fileinputformat.split.maxsize")
    hconf.set("mapreduce.input.fileinputformat.split.maxsize", "4096")
    try {
      val valid = Warc.readExactClean(spark, dir)
        .select(regexp_extract(col("url"), "doc/(\\d+)$", 1).cast("long"))
        .as[Long].collect().toSet
      val expected = docs2.map(_._1).filter(i =>
        i % Warc.TruncMod != 0 && i % Warc.NoLenMod != 0).toSet
      assert(valid == expected,
        s"missing=${(expected -- valid).take(5)} extra=${(valid -- expected).take(5)}")
    } finally {
      if (prev == null)
        hconf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else hconf.set("mapreduce.input.fileinputformat.split.maxsize", prev)
    }
  }

  test("readExact: ADJACENT quoted magics (empty fragment) reassemble VALID") {
    // 'WARC/1.0\r\nWARC/1.0\r\n' back-to-back in a payload splits out an
    // EMPTY fragment whose consumed 10-byte magic must still count in
    // the borrow accounting — filtering empties before assemble wrongly
    // invalidated the record (ADVICE r15)
    val dir = scratchDir("warc").toString
    val m = Warc.Magic
    val docs2 = Seq(
      4L -> s"double ${m}${m}quote",
      5L -> s"${m}${m}",           // payload IS two adjacent magics
      6L -> "plain neighbor")
    Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 1)
    val valid = Warc.readExactClean(spark, dir)
      .select("url", "payload").as[(String, String)].collect().toMap
    assert(valid == Map(
      s"${Warc.UriPrefix}4" -> s"double ${m}${m}quote",
      s"${Warc.UriPrefix}5" -> s"${m}${m}",
      s"${Warc.UriPrefix}6" -> "plain neighbor"))
    // the per-file automaton agrees (the streaming/gz unit)
    val bytes = docs2.map { case (id, t) =>
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: ${Warc.UriPrefix}$id\r\n" +
        s"Content-Length: ${t.getBytes("UTF-8").length}\r\n\r\n$t\r\n\r\n"
    }.mkString.getBytes("UTF-8")
    val recs = Warc.recordsFromFileBytes("f.warc", bytes).filter(_.is_valid).toSeq
    assert(recs.map(r => r.url -> r.payload).toMap == valid)
  }

  test("a NEGATIVE declared Content-Length is invalid in both read postures") {
    // 'Content-Length: -4' with the chunk ending at the header blank
    // line: rest='' gave -4 == -4 under the old length predicate while
    // assemble rejected it — the postures diverged (ADVICE r15)
    val dir = scratchDir("warc").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new org.apache.hadoop.fs.Path(s"$dir/part-00000.warc")
    val negative = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: ${Warc.UriPrefix}9\r\nContent-Length: -4\r\n\r\n"
    val good = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: ${Warc.UriPrefix}10\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val out = fs.create(f, true)
    try out.write((negative + good).getBytes("UTF-8")) finally out.close()
    for (df <- Seq(Warc.read(spark, dir), Warc.readExact(spark, dir))) {
      val validity = df.select(col("url"), col("is_valid"))
        .as[(String, Boolean)].collect().toMap
      assert(!validity(s"${Warc.UriPrefix}9"), "negative CL must be invalid")
      assert(validity(s"${Warc.UriPrefix}10"), "the neighbor must survive")
    }
  }

  test("streaming exact ingest ≡ batch exact scan, plain and gz") {
    for (gz <- Seq(false, true)) {
      val dir = scratchDir("warc").toString
      val quoted = s"stream me ${Warc.Magic}whole"
      val docs2 = Seq(1L -> "one", 2L -> quoted, 97L -> "drop me")
      Warc.synthesize(spark, docs2.toDF("doc_id", "text"), dir, nFiles = 2, gzip = gz)
      val batch = Warc.readExactClean(spark, dir).select("url", "payload")
      val name = s"warc_exact_stream_$gz"
      val q = Warc.readStreamExact(spark, dir, maxFilesPerTrigger = 1)
        .filter(col("is_valid")).select("url", "payload")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table(name)
      assert(batch.except(streamed).count() == 0 &&
        streamed.except(batch).count() == 0, s"gz=$gz")
    }
  }

  test("revisit routing: warc_type + refers_to surface; corrupt revisits drop; resolution is by VALID targets") {
    val dir = scratchDir("warc_revisit").toString
    val responses = Seq(1L, 2L, 8L, 97L).map(i => (i, s"body $i",
      s"${Warc.UriPrefix}$i", "response", ""))
    // revisit 8 → 1 (resolves), revisit 9 → 97 (target is CORRUPT →
    // unresolved), revisit 89 → 2 (the revisit ITSELF is corrupt → drops)
    val revisits = Seq(
      (8L, "", s"${Warc.UriPrefix}8", "revisit",
        s"WARC-Refers-To-Target-URI: ${Warc.UriPrefix}1\r\n"),
      (9L, "", s"${Warc.UriPrefix}9", "revisit",
        s"WARC-Refers-To-Target-URI: ${Warc.UriPrefix}97\r\n"),
      (89L, "", s"${Warc.UriPrefix}89", "revisit",
        s"WARC-Refers-To-Target-URI: ${Warc.UriPrefix}2\r\n"))
    Warc.synthesize(spark,
      (responses ++ revisits).toDF("doc_id", "text", "url", "warc_type", "extra_headers"),
      dir, nFiles = 1)
    val recs = Warc.readRouting(spark, dir).filter(col("is_valid"))
    val types = recs.select(col("warc_type")).as[String].collect().toSeq
    assert(types.count(_ == "revisit") == 2, s"corrupt revisit must drop: $types")
    val targets = recs.filter(col("warc_type") === "response")
      .select(col("url").as("__t")).distinct()
    val resolved = recs.filter(col("warc_type") === "revisit")
      .join(targets, col("refers_to") === col("__t"), "left")
      .select(col("url"), col("refers_to"), col("__t").isNotNull)
      .as[(String, String, Boolean)].collect().toSeq.sortBy(_._1)
    assert(resolved == Seq(
      (s"${Warc.UriPrefix}8", s"${Warc.UriPrefix}1", true),
      (s"${Warc.UriPrefix}9", s"${Warc.UriPrefix}97", false)), s"got $resolved")
    // non-revisit records carry a null refers_to
    assert(recs.filter(col("warc_type") === "response")
      .filter(col("refers_to").isNotNull).count() == 0)
  }
}
