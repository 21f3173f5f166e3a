package graft.text

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int) =
    Repetition.metrics(rows.toDF("doc_id", "text"), "doc_id", col("text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("hand-computed bigram masses") {
    val got = run(Seq(
      // bigrams: (a b) x3, (b a) x2 → tot=5, max=3, dup=5
      1L -> "a b a b a b",
      // bigrams: (x y), (y z) → tot=2, max=1, dup=0
      2L -> "x y z",
      // single token → no bigrams → absent
      3L -> "solo"), n = 2)
    assert(got == Map(
      1L -> ((5L, 6000L, 10000L)),
      2L -> ((2L, 5000L, 0L))), s"got $got")
  }

  test("fully repetitive doc maxes out; unique doc floors") {
    val got = run(Seq(
      1L -> "spam spam spam spam spam",   // one distinct bigram x4
      2L -> "all words here are unique"), n = 2)
    assert(got(1L) == ((4L, 10000L, 10000L)))
    assert(got(2L) == ((4L, 2500L, 0L)))
  }

  test("truncating division: 1/3 mass is 3333 bp") {
    // bigrams: (p q) x1, (q p) x1, (q r) x1 → wait: "p q p q r" →
    // (p q) x2, (q p) x1, (q r) x1: tot=4, max=2, dup=2 → 5000 bp
    val got = run(Seq(1L -> "p q r s t u v"), n = 2) // 6 unique bigrams
    assert(got(1L) == ((6L, 1666L, 0L))) // 10000*1/6 = 1666.66 → 1666
  }
}
