package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Exact substring dedup semantics on a hand-built corpus: keeper rule,
  * maximal-span coalescing of consecutive duplicated grams, non-dup
  * passthrough, and within-doc repeats NOT self-triggering. */
class ExactSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 3

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    ExactSpanDedup.removeSharedSpans(
      docs.toDF("doc_id", "text"), "doc_id", col("text"), n = N)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("shared run is kept in the lowest-id doc and excised elsewhere, as ONE maximal span") {
    val shared = "alpha beta gamma delta epsilon" // 5 tokens → three 3-grams
    val docs = Seq(
      1L -> s"intro $shared outro",
      2L -> s"prefix words here $shared and a tail",
      3L -> "completely unrelated content without repeats")
    val out = run(docs)
    // doc 1 (lowest id holding the grams) keeps everything
    assert(out(1L) == ((docs(0)._2, 0L, 0L)))
    // doc 2: the three overlapping duplicated 3-grams merge into one
    // span covering exactly the shared run
    val (clean2, nsp2, rem2) = out(2L)
    assert(nsp2 == 1L, s"expected one maximal span, got $nsp2")
    assert(rem2 == shared.length.toLong)
    assert(clean2 == "prefix words here  and a tail")
    // doc 3 untouched
    assert(out(3L) == ((docs(2)._2, 0L, 0L)))
  }

  test("a repeat WITHIN one document does not trigger removal (cross-doc df rule)") {
    val docs = Seq(
      1L -> "loop one two three and again one two three end",
      2L -> "nothing in common with that")
    val out = run(docs)
    assert(out(1L) == ((docs(0)._2, 0L, 0L)),
      "within-doc repetition must not self-remove (df counts documents)")
  }

  test("verbatim means verbatim: separator differences split grams; the identical tail still matches") {
    val docs = Seq(
      1L -> "aa bb cc dd",
      2L -> "aa  bb cc dd") // double space → "aa( )bb cc" ≠ "aa(  )bb cc"
    val out = run(docs)
    // doc 1 is the keeper of the shared "bb cc dd"
    assert(out(1L) == (("aa bb cc dd", 0L, 0L)))
    // doc 2: only the verbatim-identical tail is excised — the removal
    // starts at "bb", proving the separator-differing gram didn't match
    assert(out(2L) == (("aa  ", 1L, 8L)))
  }

  test("decontamination: only verbatim benchmark spans are excised; no keeper rule") {
    val bench = Seq(100L -> "the quick brown fox jumps over lazy dogs").toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "intro quick brown fox ending",            // 3-gram "quick brown fox" quoted
      2L -> "quick  brown fox differs by separator",   // not verbatim
      3L -> "nothing shared at all here")
      .toDF("doc_id", "text")
    val out = ExactSpanDedup.removeSpansMatching(
        corpus, "doc_id", col("text"), bench, col("text"), n = N)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("intro  ending", 1L, 15L)))
    assert(out(2L)._2 == 0L, "separator-differing span must NOT match")
    assert(out(3L) == (("nothing shared at all here", 0L, 0L)))
    // every corpus doc surfaces, benchmark docs do not
    assert(out.keySet == Set(1L, 2L, 3L))
  }

  test("three-way share keeps exactly the minimum id") {
    val s = "zeta eta theta"
    val docs = Seq(5L -> s"x $s", 9L -> s"y $s", 7L -> s"z $s")
    val out = run(docs)
    assert(out(5L)._2 == 0L)
    assert(out(7L)._2 == 1L && out(9L)._2 == 1L)
    assert(out(9L)._1 == "y ")
  }
}
