package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import graft.olhovivo.SparkTestBase

/** token_ngrams semantics: brute-force reference equality (token
  * boundaries, verbatim-substring hashes), whitespace/unicode edges,
  * and the hash law h(s..e) = poly(text[s..e]). */
class TokenNgramsSpec extends SparkTestBase {

  /** Brute-force reference: regex-split token offsets, direct
    * polynomial hash of each verbatim gram substring. */
  private def reference(s: String, n: Int): Seq[(Int, Int, Long)] = {
    val M = WinnowFingerprints.M; val B = WinnowFingerprints.B
    val cps = s.codePoints().toArray
    val toks = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < cps.length) {
      if (cps(i) != ' ') {
        val st = i
        while (i < cps.length && cps(i) != ' ') i += 1
        toks += ((st, i - 1))
      } else i += 1
    }
    (0 to toks.length - n).map { k =>
      val (gs, _) = toks(k)
      val (_, ge) = toks(k + n - 1)
      val h = (gs to ge).foldLeft(0L)((acc, j) => (acc * B + cps(j)) % M)
      (gs, ge, h)
    }
  }

  private def viaExpr(s: String, n: Int): Seq[(Int, Int, Long)] = {
    val a = TokenNgrams.compute(UTF8String.fromString(s), n)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3); (r.getInt(0), r.getInt(1), r.getLong(2))
    }
  }

  test("matches the brute-force reference on varied shapes") {
    val cases = Seq(
      "a b c d e f g",
      "  leading and trailing  spaces  ",
      "double  space   runs x y z",
      "one",
      "",
      "    ",
      "exactly five tokens here now",
      "tab\tis not a separator here only space is w x y z",
      "ünïcødé tökens 漢字 mixed ascii tail p q r")
    for (s <- cases; n <- Seq(1, 2, 3, 5))
      assert(viaExpr(s, n) == reference(s, n), s"mismatch for <$s> n=$n")
  }

  test("fewer than n tokens → empty; null → null through SQL") {
    assert(viaExpr("two tokens", 3).isEmpty)
    import spark.implicits._
    val r = Seq[String](null).toDF("t")
      .selectExpr("token_ngrams(t, 3) AS g").head()
    assert(r.isNullAt(0))
  }

  test("verbatim semantics: internal whitespace differences change the gram") {
    // same tokens, different separators → different spans AND hashes
    val a = viaExpr("x y z", 3)
    val b = viaExpr("x  y z", 3)
    assert(a.head._3 != b.head._3,
      "gram hash must cover the verbatim separators")
  }

  test("SQL registration agrees with the direct compute path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val s = "key agg row scan slow fast table value part"
    val rows = Seq(s).toDF("t")
      .select(explode(call_function("token_ngrams", col("t"), lit(5))).as("g"))
      .select("g.s", "g.e", "g.h").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(rows == reference(s, 5))
  }
}
