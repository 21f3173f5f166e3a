package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.olhovivo.SparkTestBase

/** Winnowing fingerprint semantics: brute-force reference equality
  * (window min, rightmost tie), the paper's detection guarantee, edge
  * lengths, and the df-capped pair operator. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 4
  private val W = 3

  /** Brute-force reference: direct polynomial hash per k-gram, explicit
    * per-window scan selecting min hash with RIGHTMOST tie, distinct
    * selections in position order. */
  private def reference(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val M = WinnowFingerprints.M; val B = WinnowFingerprints.B
    val cps = s.codePoints().toArray
    val nh = cps.length - k + 1
    if (nh < w) return Seq.empty
    val hs = (0 until nh).map { p =>
      (0 until k).foldLeft(0L)((acc, i) => (acc * B + cps(p + i)) % M)
    }
    val sel = scala.collection.mutable.LinkedHashSet[Int]()
    for (s0 <- 0 to nh - w) {
      val win = (s0 until s0 + w)
      val mn = win.map(hs).min
      sel += win.filter(p => hs(p) == mn).max // rightmost minimal
    }
    sel.toSeq.sorted.map(p => (p, hs(p)))
  }

  private def viaExpr(s: String, k: Int = K, w: Int = W): Seq[(Int, Long)] = {
    val a = WinnowFingerprints.compute(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2); (r.getInt(0), r.getLong(1))
    }
  }

  test("matches the brute-force reference on random small-alphabet strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val len = 6 + rnd.nextInt(40)
      // alphabet of 3 → frequent repeated k-grams → tie rule exercised
      val s = Seq.fill(len)("abc" (rnd.nextInt(3))).mkString
      assert(viaExpr(s) == reference(s, K, W), s"mismatch on '$s'")
    }
  }

  test("guarantee: any common run of >= w + k - 1 chars yields a shared hash") {
    val rnd = new scala.util.Random(13)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val clone = randStr(K + W - 1) // minimal guaranteed-detectable run
    for (_ <- 1 to 50) {
      val a = randStr(20) + clone + randStr(20)
      val b = randStr(35) + clone + randStr(5)
      val ha = viaExpr(a).map(_._2).toSet
      val hb = viaExpr(b).map(_._2).toSet
      assert((ha & hb).nonEmpty, s"clone run undetected between '$a' and '$b'")
    }
  }

  test("edges: too-short input -> empty; exactly one window -> one pick; null -> null") {
    assert(viaExpr("abc", 4, 3).isEmpty)       // no k-gram at all (nh = 0)
    assert(viaExpr("abcde", 4, 3).isEmpty)     // nh = 2 < w
    assert(viaExpr("abcdef", 4, 3).size == 1)  // nh = 3 = w → one window
    val r = spark.range(1).select(
      call_function("winnow_fp", lit(null).cast("string"), lit(4), lit(3)))
    assert(r.head().isNullAt(0))
  }

  test("identical documents fingerprint identically; disjoint share nothing") {
    val doc = "the quick brown fox jumps over the lazy dog"
    assert(viaExpr(doc) == viaExpr(doc))
    val ha = viaExpr("aaaaaaaaaaaaaaaaaaaa").map(_._2).toSet
    val hb = viaExpr("bbbbbbbbbbbbbbbbbbbb").map(_._2).toSet
    assert((ha & hb).isEmpty)
  }

  test("over-long document is rejected loudly, not mis-fingerprinted") {
    val big = "a" * (1 << 20)
    val ex = intercept[Exception] {
      viaExpr(big, 16, 8)
    }
    assert(ex.getMessage.contains("shard"), ex.getMessage)
  }

  test("spanDupStats: clones score high, unique doc scores 0, boilerplate COUNTS") {
    val boiler = "this licensed text appears everywhere in the corpus"
    val docs = Seq(
      (0L, s"alpha $boiler omega"),
      (1L, s"start $boiler end"),
      (2L, "a wholly original composition with no repeated material inside")
    )
    val out = graft.text.SpanDedup.spanDupStats(
        docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 0/1 share the boilerplate run → most fingerprints shared
    assert(out(0L)._2 > 0 && out(1L)._2 > 0)
    assert(out(0L)._3 > 0 && out(0L)._3 <= 10000)
    // the unique doc shares nothing
    assert(out(2L) == ((out(2L)._1, 0L, 0L)))
    // dup_bp is the truncated integer ratio
    for ((_, (nfp, nsh, bp)) <- out) assert(bp == nsh * 10000 / nfp)
  }

  test("removeSharedSpans: canonical copy kept, clone's span excised, provenance counts") {
    val boiler = "this licensed text appears everywhere in the corpus"
    val docs = Seq(
      (0L, s"alpha $boiler omega"),
      (1L, s"start $boiler end"),
      (2L, "a wholly original composition with no repeated material inside")
    )
    val out = graft.text.SpanDedup.removeSharedSpans(
        docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // the lowest-id holder keeps its text verbatim
    assert(out(0L) == ((s"alpha $boiler omega", 0L, 0L)))
    // the non-keeper loses the shared run (guaranteed detection at
    // >= w + k - 1 = 23 chars); the unique pre/suffix chars survive
    val (clean1, nSpans1, removed1) = out(1L)
    assert(nSpans1 >= 1 && removed1 > 0)
    assert(clean1.length == s"start $boiler end".length - removed1)
    assert(!clean1.contains(boiler))
    assert(clean1.startsWith("start ") || clean1.startsWith("start".take(5)))
    assert(clean1.endsWith("end"))
    // untouched doc: identity row
    assert(out(2L) == (("a wholly original composition with no repeated material inside", 0L, 0L)))
  }

  test("removeSharedSpans: overlapping and adjacent intervals merge into one span") {
    // two identical docs: every fingerprint of doc 1 is shared, all
    // intervals chain together -> ONE maximal span covering the whole
    // fingerprintable region of the clone; doc 0 is the keeper
    val t = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopqrstuvwxyz"
    val out = graft.text.SpanDedup.removeSharedSpans(
        Seq((0L, t), (1L, t)).toDF("doc_id", "text"), "doc_id", col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((t, 0L, 0L)))
    val (clean1, nSpans1, removed1) = out(1L)
    assert(nSpans1 == 1L, s"expected one merged span, got $nSpans1")
    assert(removed1 > 0 && clean1.length == t.length - removed1)
  }

  test("removeSpansMatching: benchmark-quoting span excised, no keeper rule, rest kept") {
    val benchLine = "the quick brown fox jumps over the lazy dog repeatedly"
    val corpus = Seq(
      (10L, s"prefix text here $benchLine suffix text here"),
      (11L, "a completely clean document with no benchmark overlap at all"))
    val bench = Seq((0L, s"Q: complete this: $benchLine"))
    val out = graft.text.SpanDedup.removeSpansMatching(
        corpus.toDF("doc_id", "text"), "doc_id", col("text"),
        bench.toDF("doc_id", "text"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // corpus doc 10 quotes the benchmark line -> span excised even
    // though doc 10's id is lower than nothing (no keeper rule here)
    val (clean10, n10, rm10) = out(10L)
    assert(n10 >= 1 && rm10 > 0)
    assert(!clean10.contains(benchLine))
    assert(clean10.startsWith("prefix"))
    assert(clean10.endsWith("here"))
    // clean doc untouched
    assert(out(11L) == (("a completely clean document with no benchmark overlap at all", 0L, 0L)))
  }

  test("sharedSpanPairs: planted clone pair found, boilerplate df-capped out") {
    // 12 docs share one boilerplate sentence (df 12 > cap 4) — that
    // alone must NOT produce pairs; docs 100/101 also share a long
    // unique clone → the only surviving pair
    val boiler = "this licensed text appears everywhere in the corpus"
    val clone = "an unmistakably duplicated span of considerable length here"
    val docs =
      (0 until 12).map(i => (i.toLong, s"unique prefix $i $boiler suffix $i")) ++
      Seq((100L, s"alpha $clone omega"), (101L, s"start $clone end"))
    val out = graft.text.SpanDedup.sharedSpanPairs(
        docs.toDF("doc_id", "text"), "doc_id", col("text"),
        minCommon = 2, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 101L)), s"got $out")
  }
}
