package graft.functions

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** NFKC expression ≡ java.text.Normalizer, including the quick-check
  * fast path and null/total behavior. */
class NfkcSpec extends SparkTestBase {
  import spark.implicits._

  private val samples = Seq(
    "ﬁrst ½ Ａ ㎞ x² ﬂow",      // compatibility glyphs
    "already plain ascii",
    "",                            // empty
    "café naïve",                  // NFC-composed, NFKC-stable
    "éclair",                // combining accent -> composes
    " nbsp edges ", // compatibility whitespace
    "㈱㊦⑴⒈")                    // enclosed/parenthesized forms

  test("nfkc equals java.text.Normalizer on every sample") {
    val got = samples.toDF("t")
      .select(call_function("nfkc", col("t"))).as[String].collect().toSeq
    val expected = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFKC))
    assert(got == expected)
  }

  test("null propagates") {
    val got = Seq[Option[String]](None, Some("x")).toDF("t")
      .select(call_function("nfkc", col("t"))).as[Option[String]].collect().toSeq
    assert(got == Seq(None, Some("x")))
  }
}
