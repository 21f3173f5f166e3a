package graft.sources

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Per-member-splittable .warc.gz: index exactness, parallel-scan
  * equivalence with the whole-file decode, and corrupt-member
  * isolation with resync. */
class WarcGzSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 300L).map(i => i -> s"document number $i with some body text")

  private def gzZone(nFiles: Int = 2): String = {
    val dir = scratchDir("warcgz").toString
    Warc.synthesize(spark, docs.toDF("doc_id", "text"), dir,
      nFiles = nFiles, gzip = true)
    dir
  }

  test("member index finds exactly one member per record, covering every byte") {
    val dir = gzZone()
    val idx = WarcGz.memberIndex(spark, dir)
      .as[WarcGz.Member].collect().groupBy(_.file)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(idx.valuesIterator.map(_.length).sum == docs.size)
    for ((file, members) <- idx) {
      val sorted = members.sortBy(_.offset)
      assert(sorted.head.offset == 0)
      assert(sorted.forall(_.ok))
      // contiguous: each member starts where the previous ended, and the
      // last ends at the file's physical length
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.offset + a.length == b.offset)
        case _ =>
      }
      val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(file)).getLen
      assert(sorted.last.offset + sorted.last.length == len)
    }
  }

  test("parallel member scan ≡ whole-file exact decode") {
    val dir = gzZone()
    val whole = Warc.readExact(spark, dir)
    val split = WarcGz.readSplit(spark, dir, parallelism = 7)
    assert(whole.except(split).count() == 0 && split.except(whole).count() == 0)
  }

  test("a corrupt member drops alone; the walker resyncs to the next member") {
    val dir = gzZone(nFiles = 1)
    // flip bytes INSIDE the deflate stream of a middle member
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".gz")).get
    val clean = WarcGz.memberIndex(spark, dir).as[WarcGz.Member]
      .collect().sortBy(_.offset)
    val victim = clean(clean.length / 2)
    val bytes = {
      val in = fs.open(file)
      try { val b = new Array[Byte](fs.getFileStatus(file).getLen.toInt)
        in.readFully(0, b); b } finally in.close()
    }
    var i = victim.offset.toInt + 14
    while (i < victim.offset.toInt + victim.length.toInt - 9) {
      bytes(i) = (~bytes(i)).toByte; i += 1
    }
    val out = fs.create(file, true)
    try out.write(bytes) finally out.close()

    val idx = WarcGz.memberIndex(spark, dir).as[WarcGz.Member]
      .collect().sortBy(_.offset)
    assert(idx.count(!_.ok) >= 1, "the damaged span must be indexed as corrupt")
    // exact recovery contract: every record whose member bytes the
    // damage does NOT touch survives iff it was valid before (the
    // single file is sorted by doc_id, so member k ↔ k-th id)
    val sortedIds = docs.map(_._1).sorted
    val corruptSpans = idx.filter(!_.ok).map(m => (m.offset, m.offset + m.length))
    val damagedIds = clean.zipWithIndex.collect {
      case (m, i) if corruptSpans.exists(s =>
        m.offset < s._2 && m.offset + m.length > s._1) => sortedIds(i)
    }.toSet
    val baselineIds = docs.map(_._1).filter(id =>
      id % Warc.TruncMod != 0 && id % Warc.NoLenMod != 0).toSet
    val recovered = WarcGz.readMembers(spark, WarcGz.memberIndex(spark, dir))
      .filter(col("is_valid"))
      .select(regexp_extract(col("url"), "doc/(\\d+)$", 1).cast("long"))
      .as[Long].collect().toSet
    assert(damagedIds.nonEmpty, "the victim member must be in a corrupt span")
    assert(recovered == baselineIds -- damagedIds,
      s"recovered ${recovered.size}, expected ${(baselineIds -- damagedIds).size}" +
        s" (damaged: $damagedIds)")
  }

  test("degenerate gz inputs: empty file indexes to zero members; pure garbage to one corrupt span") {
    val dir = scratchDir("warcgz").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empty = new org.apache.hadoop.fs.Path(s"$dir/empty.warc.gz")
    fs.create(empty, true).close()
    val junk = new org.apache.hadoop.fs.Path(s"$dir/junk.warc.gz")
    val out = fs.create(junk, true)
    try out.write("this is not gzip at all".getBytes("UTF-8")) finally out.close()
    val idx = WarcGz.memberIndex(spark, dir).as[WarcGz.Member].collect()
    assert(!idx.exists(_.file.endsWith("empty.warc.gz")))
    val junkRows = idx.filter(_.file.endsWith("junk.warc.gz"))
    assert(junkRows.forall(!_.ok) && junkRows.nonEmpty)
    // and the scan surfaces them as invalid records, never throwing
    val rows = WarcGz.readMembers(spark, WarcGz.memberIndex(spark, dir))
    assert(rows.filter(col("is_valid")).count() == 0)
  }

  test("stored sidecar round trip: readIndex(writeIndex(idx)) drives an identical scan") {
    val dir = gzZone()
    val side = scratchDir("warcgz_cdx").toString
    WarcGz.writeIndex(WarcGz.memberIndex(spark, dir), side)
    val fresh = WarcGz.readSplit(spark, dir, parallelism = 5)
    val stored = WarcGz.readMembers(spark, WarcGz.readIndex(spark, side),
      parallelism = 5)
    assert(fresh.except(stored).count() == 0 && stored.except(fresh).count() == 0)
  }

  test("member-incremental file decode ≡ whole-file decode; corrupt member isolates") {
    val dir = gzZone(nFiles = 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".gz")).get
    val in = fs.open(file)
    val bytes = try {
      val len = fs.getFileStatus(file).getLen.toInt
      val b = new Array[Byte](len); in.readFully(0, b); b
    } finally in.close()
    // clean file: the member-incremental iterator (the streaming unit)
    // reproduces the member-scan row set exactly
    val inc = Warc.recordsFromFileBytes(file.getName, bytes).toSeq
    val viaScan = WarcGz.readSplit(spark, dir).as[WarcRec].collect().toSeq
    // toString as the sort key: invalid rows carry null urls
    assert(inc.sortBy(_.toString) == viaScan.sortBy(_.toString))
    // corrupt a middle member: exactly one invalid row appears and the
    // records AFTER it still decode (the whole-file GZIPInputStream
    // decode truncated there)
    val idx = WarcGz.memberIndex(spark, dir).as[WarcGz.Member]
      .collect().sortBy(_.offset)
    val victim = idx(idx.length / 2)
    val broken = bytes.clone()
    val at = victim.offset.toInt + victim.length.toInt / 2
    broken(at) = (broken(at) ^ 0x5a).toByte
    val rec2 = Warc.recordsFromFileBytes(file.getName, broken).toSeq
    val afterVictim = idx.drop(idx.length / 2 + 1).length
    assert(rec2.count(!_.is_valid) >= 1, "the damaged member must surface")
    assert(rec2.count(_.is_valid) >= afterVictim,
      "members after the damaged one must still decode")
  }

  test("whole-file readers still decode the concatenated per-record layout") {
    val dir = gzZone()
    val viaText = Warc.readClean(spark, dir).select("url").as[String].collect().toSet
    val expected = docs.filter { case (id, _) =>
      id % Warc.TruncMod != 0 && id % Warc.NoLenMod != 0 &&
        id % Warc.MagicQuoteMod != 0 }
      .map { case (id, _) => s"${Warc.UriPrefix}$id" }.toSet
    // readClean (chunk semantics) drops the %101 quoting docs; the
    // member scan keeps them — both still DECODE every member
    assert(viaText == expected)
    val viaSplit = WarcGz.readSplit(spark, dir).filter(col("is_valid"))
      .select("url").as[String].collect().toSet
    assert(viaSplit == expected ++ docs.collect {
      case (id, _) if id % Warc.MagicQuoteMod == 0 && id % Warc.TruncMod != 0 &&
        id % Warc.NoLenMod != 0 => s"${Warc.UriPrefix}$id" })
  }

  test("readMemberTexts: ordinals follow file order; corrupt member isolates with null text") {
    // three members: A, B, C — then corrupt B's bytes in place
    val dir = scratchDir("gztext").toString
    val path = new org.apache.hadoop.fs.Path(s"$dir/m.gz")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bos = new java.io.ByteArrayOutputStream()
    for (t <- Seq("alpha", "bravo", "charlie")) {
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(t.getBytes("UTF-8")); gz.close()
    }
    val bytes = bos.toByteArray
    // find the second member's start (the index tells us) and flip bytes
    val out = fs.create(path, true); out.write(bytes); out.close()
    val idx0 = WarcGz.memberIndex(spark, dir).as[WarcGz.Member]
      .collect().sortBy(_.offset)
    assert(idx0.length == 3 && idx0.forall(_.ok))
    val b = bytes.clone()
    val mid = idx0(1)
    // corrupt the deflate stream body (skip the 10-byte header so the
    // walker still sees a member boundary)
    for (i <- (mid.offset + 10).toInt until (mid.offset + mid.length - 8).toInt)
      b(i) = 0x55.toByte
    val out2 = fs.create(path, true); out2.write(b); out2.close()
    val got = WarcGz.readMemberTexts(spark, WarcGz.memberIndex(spark, dir))
      .select(col("member_idx"), col("text"), col("ok"))
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L), s"ordinals: ${got.toSeq}")
    assert(got(0) == (0L, "alpha", true))
    assert(!got(1)._3 && got(1)._2 == null, s"corrupt member must isolate: ${got(1)}")
    assert(got(2)._2 == "charlie" && got(2)._3, s"neighbor survives: ${got(2)}")
  }

  test("a member span past Int.MaxValue surfaces as one ok=false row in both readers (ADVICE r17)") {
    // a real >2 GiB member can't be written in a test; drive the guard
    // through a FORGED index row over a real file (the readers trust
    // the index's spans — the documented sidecar-staleness posture)
    val dir = scratchDir("gzbig").toString
    val path = new org.apache.hadoop.fs.Path(s"$dir/m.gz")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bos = new java.io.ByteArrayOutputStream()
    for (t <- Seq("oversize", "alpha")) {
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(t.getBytes("UTF-8")); gz.close()
    }
    val out = fs.create(path, true); out.write(bos.toByteArray); out.close()
    val real = WarcGz.memberIndex(spark, dir).as[WarcGz.Member]
      .collect().sortBy(_.offset)
    assert(real.length == 2 && real.forall(_.ok))
    // two forged spans: one past Int.MaxValue, and one AT the boundary
    // (Int.MaxValue exactly) — the latter passed the r17 guard but blows
    // the HotSpot max array size (~MaxValue-2) with an OutOfMemoryError
    // no handler catches (ADVICE r18): both must isolate, not throw
    val forged = Seq(
      (real(0).file, real(0).offset, Int.MaxValue.toLong + 10L, true),
      (real(0).file, real(0).offset + 1, Int.MaxValue.toLong, true),
      (real(1).file, real(1).offset, real(1).length, true))
      .toDF("file", "offset", "length", "ok")
    val texts = WarcGz.readMemberTexts(spark, forged)
      .select(col("member_idx"), col("text"), col("ok"))
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    assert(texts.length == 3)
    assert(!texts(0)._3 && texts(0)._2 == null,
      s"oversize span must isolate, not throw: ${texts(0)}")
    assert(!texts(1)._3 && texts(1)._2 == null,
      s"boundary span (Int.MaxValue) must isolate, not throw: ${texts(1)}")
    assert(texts(2) == (2L, "alpha", true), s"neighbor survives: ${texts(2)}")
    val recs = WarcGz.readMembers(spark, forged)
      .select(col("is_valid")).as[Boolean].collect()
    assert(recs.count(_ == false) >= 1, s"readMembers must emit the bad row: ${recs.toSeq}")
  }
}
