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
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 2.3333))) // (3+1+3)/3
    assert(out(2L) == ((2L, 2.0)))    // (3+1)/2
    assert(out(3L) == ((1L, 1.0)))
    assert(!out.contains(4L))
  }
}
