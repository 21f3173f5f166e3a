package graft.text

import org.apache.spark.sql.functions._
import graft.functions.BoundedTopK
import graft.olhovivo.SparkTestBase

/** Semantics of the corpus-prep operators: sliding-window chunk
  * placement/coverage, blocklist screening, inverted-index postings and
  * the bounded smallest-k aggregate behind them. */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("slidingChunks: short doc → one short chunk") {
    val out = Chunking.slidingChunks(doc(5), "doc_id", $"text", 32, 24).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_tokens") == 5L)
    assert(out.head.getAs[String]("chunk_text") == "t1 t2 t3 t4 t5")
  }

  test("slidingChunks: exact window size → one full chunk, no empty tail") {
    val out = Chunking.slidingChunks(doc(32), "doc_id", $"text", 32, 24).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_tokens") == 32L)
  }

  test("slidingChunks: one token past a window starts exactly one more chunk") {
    val out = Chunking.slidingChunks(doc(33), "doc_id", $"text", 32, 24)
      .orderBy($"chunk_idx").collect()
    assert(out.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 24L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(32L, 9L))
  }

  test("slidingChunks: every token covered, consecutive chunks overlap by size-stride") {
    val n = 80 // starts 0,24,48; last window [48,80) is exactly full
    val rows = Chunking.slidingChunks(doc(n), "doc_id", $"text", 32, 24)
      .orderBy($"chunk_idx").collect()
    assert(rows.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 24L, 48L))
    val covered = rows.flatMap { r =>
      val s = r.getAs[Long]("token_start").toInt
      s until (s + r.getAs[Long]("n_tokens").toInt)
    }.toSet
    assert(covered == (0 until n).toSet)
    // chunk i and i+1 share size-stride = 8 tokens
    val texts = rows.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(texts(0).takeRight(8) == texts(1).take(8))
  }

  test("blocklist: hits sorted distinct; clean() keeps only unflagged docs") {
    val docs = Seq(
      (1L, "zz aa zz aa clean"),
      (2L, "totally fine"),
      (3L, "aa only")).toDF("doc_id", "text")
    val hits = Blocklist.annotate(docs, $"text", Seq("zz", "aa"))
      .select($"doc_id", $"hits", $"n_hits")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(hits(1L) == ((Seq("aa", "zz"), 2L))) // sorted, deduped
    assert(hits(2L) == ((Seq(), 0L)))
    assert(hits(3L) == ((Seq("aa"), 1L)))
    val kept = Blocklist.clean(docs, $"text", Seq("zz", "aa"))
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
  }

  test("BoundedSmallestK ≡ slice(sort_array(collect_set)) on multiset data") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(500)((s"g${rng.nextInt(5)}", rng.nextInt(40).toLong))
    val df = rows.toDF("g", "v")
    val k = 8
    val got = df.groupBy($"g").agg(BoundedTopK.smallestK($"v", k).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = df.groupBy($"g")
      .agg(slice(sort_array(collect_set($"v")), 1, k).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
    assert(got.values.forall(_.length <= k))
  }

  test("invertedIndex: exact df, postings are the cap smallest doc ids, sorted") {
    val docs = Seq(
      (30L, "x y"), (10L, "x"), (20L, "x x y z")).toDF("doc_id", "text")
    val out = Postings.invertedIndex(docs, "doc_id", $"text", 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(out("x") == ((3L, Seq(10L, 20L)))) // df exact, postings capped at 2
    assert(out("y") == ((2L, Seq(20L, 30L))))
    assert(out("z") == ((1L, Seq(20L))))
  }
}
