package graft.text

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Semantics of the curation-stage operators: corpus line dedup
  * (boilerplate removal) and PII redaction. */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("dropDuplicateLines: boilerplate dropped, order kept, df boundary inclusive") {
    // "cookie banner" appears in 3 docs, "unique ..." lines in 1 each
    val docs = Seq(
      (1L, Seq("unique alpha", "cookie banner", "unique beta")),
      (2L, Seq("cookie banner", "unique gamma")),
      (3L, Seq("unique delta", "cookie banner")),
      (4L, Seq("unique epsilon"))).toDF("doc_id", "lines")
    // maxDf = 2: the banner (df 3) dropped, everything else (df 1) kept
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", col("lines"), maxDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("unique alpha unique beta", 3L, 2L)))
    assert(out(2L) == (("unique gamma", 2L, 1L)))
    assert(out(4L) == (("unique epsilon", 1L, 1L)))
    // maxDf = 3: boundary is inclusive — df == maxDf survives
    val keep = LineDedup.dropDuplicateLines(docs, "doc_id", col("lines"), maxDf = 3)
      .filter(col("doc_id") === 2L).head()
    assert(keep.getString(1) == "cookie banner unique gamma")
  }

  test("dropDuplicateLines: fully-boilerplate docs empty out but stay present") {
    val docs = Seq(
      (1L, Seq("same line")), (2L, Seq("same line")), (3L, Seq("same line")),
      (4L, Seq("fresh line"))).toDF("doc_id", "lines")
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", col("lines"), maxDf = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "no document row may vanish")
    assert(out(1L) == (("", 0L)) && out(4L) == (("fresh line", 1L)))
  }

  test("tokenWindows: full windows plus ragged tail") {
    val got = Seq(Tuple1("a b c d e")).toDF("text")
      .select(LineDedup.tokenWindows(col("text"), 2).as("w"))
      .head().getSeq[String](0)
    assert(got == Seq("a b", "c d", "e"))
  }

  test("redactPii: masks all three types, order prevents cross-matching") {
    val cases = Map(
      "mail me at jo.na+x@sub.example.org today" -> "mail me at <EMAIL> today",
      "server 192.168.1.254 and 10.0.0.1 up" -> "server <IP> and <IP> up",
      "call +55 (11) 91234-5678 now" -> "call <PHONE> now",
      "call 555 010 0042." -> "call <PHONE>.",
      // an IP must become <IP>, never a partial <PHONE>
      "from 10.20.30.40 dial 0800 123 456" -> "from <IP> dial <PHONE>",
      "no pii here at all" -> "no pii here at all")
    val got = cases.keys.toSeq.toDF("t")
      .select(col("t"), Redact.redactPii(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"input: $in") }
  }

  test("tokenCount counts placeholder occurrences") {
    val n = Seq(Tuple1("<EMAIL> x <EMAIL> y <IP>")).toDF("t")
      .select(Redact.tokenCount(col("t"), Redact.EmailToken).as("e"),
        Redact.tokenCount(col("t"), Redact.IpToken).as("i"))
      .head()
    assert(n.getLong(0) == 2L && n.getLong(1) == 1L)
  }
}
