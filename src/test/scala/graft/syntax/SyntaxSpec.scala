package graft.syntax

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase
import graft.Tables

/** The fluent facade must be a pure delegate: every syntax call
  * produces the same result as the object-API call it wraps. */
class SyntaxSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("dedup facade delegates: exact, minhash, simhash, jaccard") {
    val docs = Tables.documents(spark, dir)
    assert(rows(docs.dedupExact("doc_id", col("text"))) ==
      rows(graft.dedup.Dedup.exactCanonical(docs, "doc_id", col("text"))))
    assert(rows(docs.withMinhashSignature(col("text"), k = 4)) ==
      rows(graft.dedup.Dedup.withMinhashSignature(docs, col("text"), 4, 3, "sig")))
    assert(rows(docs.withSimhash(col("text"), bits = 16)) ==
      rows(graft.dedup.Dedup.withSimhash(docs, col("text"), 16, "simhash")))
  }

  test("decontamination and repetition facades delegate") {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 41 === 0)
    val corpus = docs.filter(col("doc_id") % 41 =!= 0)
    assert(rows(corpus.decontaminateAgainst(bench, "doc_id", col("text"), n = 3)) ==
      rows(graft.dedup.Decontaminate.overlap(
        corpus, "doc_id", col("text"), bench, col("text"), 3)))
    assert(rows(docs.repetitionMetrics("doc_id", col("text"))) ==
      rows(graft.text.Repetition.metrics(docs, "doc_id", col("text"), 2)))
  }

  test("vector and operator facades delegate") {
    val emb = Tables.embeddings(spark, dir)
    assert(rows(emb.quantizedInt8()) ==
      rows(graft.similarity.Quantize.withInt8(emb)))
    assert(rows(emb.meanCentroid(pmod(col("vec_id"), lit(5)), col("embedding"))) ==
      rows(graft.similarity.Pooling.meanCentroid(
        emb, pmod(col("vec_id"), lit(5)), col("embedding"))))
    val left = (1L to 100L).map(Tuple1(_)).toDF("k")
    val right = (1L to 100L).filter(_ % 9 == 0).map(Tuple1(_)).toDF("rk")
    assert(rows(left.bloomSemiJoin(col("k"), right, col("rk"))) ==
      rows(graft.operators.BloomPrune.semiJoin(left, col("k"), right, col("rk"))))
  }

  test("corpus-prep and snapshot facades delegate") {
    val docs = Tables.documents(spark, dir)
    assert(rows(docs.slidingChunks("doc_id", col("text"), 32, 24)) ==
      rows(graft.text.Chunking.slidingChunks(docs, "doc_id", col("text"), 32, 24)))
    assert(rows(docs.blocklistClean(col("text"), Seq("spark", "hash"))) ==
      rows(graft.text.Blocklist.clean(docs, col("text"), Seq("spark", "hash"))))
    assert(rows(docs.invertedIndex("doc_id", col("text"), cap = 5)) ==
      rows(graft.text.Postings.invertedIndex(docs, "doc_id", col("text"), 5)))
    assert(rows(docs.capPerGroup(Seq("source"), Seq(col("doc_id")), 3)) ==
      rows(graft.operators.QuotaCap.capPerGroup(
        docs, Seq("source"), Seq(col("doc_id")), 3)))
    val snap = Seq(("a", 1L, "x")).toDF("k", "v", "p")
    val upd = Seq(("a", 2L, "y"), ("b", 1L, "z")).toDF("k", "v", "p")
    assert(rows(snap.upsert(upd, Seq("k"), Seq("v"))) ==
      rows(graft.operators.Upsert.latestWins(snap, upd, Seq("k"), Seq("v"))))
    val obs = Seq(("a", 1L, "s1"), ("a", 2L, "s2")).toDF("k", "t", "st")
    assert(rows(obs.scd2(Seq("k"), "t", "st")) ==
      rows(graft.operators.Scd2.intervalize(obs, Seq("k"), "t", "st")))
  }

  test("round-6 operator facades delegate") {
    import graft.operators.Expectations.Rule
    val docs = Tables.documents(spark, dir)
    assert(rows(docs.fluencyScores("doc_id", col("text"))) ==
      rows(graft.text.Fluency.scoreByCorpusFrequency(docs, "doc_id", col("text"))))
    val obs = Seq(("a", 10L, 2L, Some(1.0)), ("a", 30L, 1L, None))
      .toDF("k", "b", "n", "v")
    assert(rows(obs.gapFill(Seq("k"), "b", 10L, Map("n" -> lit(0L)), Seq("v"))) ==
      rows(graft.operators.Resample.gapFill(obs, Seq("k"), "b", 10L,
        Map("n" -> lit(0L)), Seq("v"))))
    val rules = Seq(Rule("n_pos", col("n") > 0))
    assert(rows(obs.expectationsAudit(rules)) ==
      rows(graft.operators.Expectations.audit(obs, rules)))
    assert(rows(obs.aggState(Seq("k"), "n")) ==
      rows(graft.operators.AggMaintenance.state(obs, Seq("k"), "n")))
    val (fClean, fBad) = obs.quarantine(rules)
    val (oClean, oBad) = graft.operators.Expectations.quarantine(obs, rules)
    assert(rows(fClean) == rows(oClean) && rows(fBad) == rows(oBad))
    val zdir = scratchDir("syntax-zorder").toString
    obs.writeZOrdered(s"$zdir/z", Seq("b", "n"), 2)
    assert(spark.read.parquet(s"$zdir/z").count() == obs.count())
  }

  test("round-8 facades delegate: calibrate, diff, rank, histogram, pagerank, projection") {
    val docs = Tables.documents(spark, dir)
    assert(rows(docs.rankCalibrated(col("source"), col("n_chars"), col("doc_id"))) ==
      rows(graft.operators.Calibrate.rankCalibrate(
        docs, col("source"), col("n_chars"), col("doc_id"))))
    val older = docs.filter(col("doc_id") % 3 =!= 0)
    val newer = docs.filter(col("doc_id") % 5 =!= 0)
    assert(rows(older.snapshotDiff(newer, "doc_id",
        graft.functions.Portable.h60(col("text")))) ==
      rows(graft.operators.SnapshotDiff.diff(older, newer, "doc_id",
        graft.functions.Portable.h60(col("text")))))
    assert(rows(docs.select(col("doc_id"), col("n_chars"))
        .globalRanked(col("n_chars"), col("doc_id"))) ==
      rows(graft.operators.GlobalRank.globalRank(
        docs.select(col("doc_id"), col("n_chars")),
        col("n_chars"), col("doc_id"))))
    assert(rows(docs.histogram(col("n_chars"), 8)) ==
      rows(graft.operators.Histogram.equiWidth(docs, col("n_chars"), 8)))
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    assert(rows(edges.pageRank("src", "dst", 2)) ==
      rows(graft.operators.PageRank.run(edges, "src", "dst", 2)))
    val emb = Tables.embeddings(spark, dir).limit(50)
    val viaFacade = emb.randomProjected(col("embedding"), k = 4, dim = 64)
    val signs = graft.similarity.RandomProjection.signMatrix(64, 4)
    val direct = emb.withColumn("proj", array(signs.map(row =>
      graft.similarity.RandomProjection.coordinate(
        graft.similarity.RandomProjection.quantize(col("embedding")), row))
      .toSeq: _*))
    assert(rows(viaFacade) == rows(direct))
  }

  test("pipeline chains read naturally end to end") {
    val docs = Tables.documents(spark, dir)
    // column-preserving stages chain freely (aggregating stages like
    // dedupExact/repetitionMetrics end a chain by design)
    val curated = docs
      .withSimhash(col("text"), bits = 16)
      .withSplit(col("text"), Seq("train" -> 0.9, "val" -> 0.1))
    assert(curated.columns.contains("simhash") && curated.columns.contains("split"))
    assert(curated.filter(col("split").isin("train", "val")).count() ==
      curated.count() && curated.count() > 0)
  }
}
