package graft.dedup

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], bench: Seq[String], n: Int) =
    Decontaminate.overlap(
        corpus.toDF("doc_id", "text"), "doc_id", col("text"),
        bench.toDF("text"), col("text"), n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("flags docs sharing an n-gram; counts distinct shared grams; clean docs absent") {
    val bench = Seq("the quick brown fox jumps")
    val corpus = Seq(
      1L -> "a sentence with the quick brown fox inside",  // shares 2 trigrams
      2L -> "quick brown dogs are not foxes",              // no full trigram
      3L -> "the quick brown fox jumps exactly",           // shares 3 trigrams
      4L -> "completely unrelated words here")
    val got = run(corpus, bench, n = 3)
    assert(got == Map(1L -> 2L, 3L -> 3L), s"got $got")
  }

  test("repeated grams in a doc count once; short docs never match") {
    val bench = Seq("x y z")
    val corpus = Seq(
      1L -> "x y z and again x y z",  // gram "x y z" appears twice → hits = 1
      2L -> "x y")                    // fewer than n tokens → no grams
    assert(run(corpus, bench, n = 3) == Map(1L -> 1L))
  }

  test("grams are whitespace-exact (tokenizer splits on whitespace only)") {
    // Portable.tokens does NOT normalize case or punctuation — a cased
    // variant is a different gram (same contract as the dedup operators)
    assert(run(Seq(1L -> "The quick brown fox"), Seq("the quick brown fox"), 3)
      == Map(1L -> 1L)) // only "quick brown fox" collides
    assert(run(Seq(1L -> "extra  spaces   collapse fine"),
      Seq("extra spaces collapse fine"), 4) == Map(1L -> 1L))
  }
}
