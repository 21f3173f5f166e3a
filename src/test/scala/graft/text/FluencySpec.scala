package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Fluency-score semantics on a hand-computed corpus. */
class FluencySpec extends SparkTestBase {
  import spark.implicits._

  test("mean corpus bigram frequency, hand-checked; short docs absent") {
    val docs = Seq(
      (1L, "a b a b"),  // bigrams: (a b)x2, (b a)
      (2L, "a b c"),    // (a b), (b c)
      (3L, "x y"),      // (x y)
      (4L, "solo"))     // no bigrams → absent
      .toDF("doc_id", "text")
    // corpus df: "a b"=3, "b a"=1, "b c"=1, "x y"=1
    val out = Fluency.scoreByCorpusFrequency(docs, "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 23333L))) // 10000*(3+1+3)/3, truncated
    assert(out(2L) == ((2L, 20000L))) // 10000*(3+1)/2
    assert(out(3L) == ((1L, 10000L)))
    assert(!out.contains(4L))
  }

  test("bigramHashes is total: empty and 1-token texts give an empty array") {
    val out = Seq((1L, ""), (2L, "solo"), (3L, "a b")).toDF("id", "text")
      .select($"id", Fluency.bigramHashes($"text").as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }
}
