package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_ngrams(text, n)` → `array<struct<s:int, e:int, h:long>>`: every
  * sliding window of `n` consecutive TOKENS, as the code-point interval
  * `[s, e]` (inclusive) it covers in the original text plus the
  * polynomial hash `h` of the VERBATIM substring `text[s..e]` — the
  * map-only primitive of exact substring dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022: remove any
  * ≥ N-token span that appears verbatim elsewhere in the corpus).
  * Winnowing (`winnow_fp`) SAMPLES grams for approximate span detection;
  * this enumerates every token-aligned gram so the downstream dedup can
  * be exact.
  *
  * Tokens are maximal runs of code points ≠ ' ' (U+0020) — the oracle
  * restates the identical rule per-character, and the interval carries
  * the verbatim inter-token separators, so occurrences differing only in
  * internal whitespace hash (and compare) as different, which is what
  * "verbatim" means. Real corpora normalize whitespace upstream (q64/q65
  * territory); this expression deliberately does not.
  *
  * One O(L) pass per document: code points → token boundaries → prefix
  * hashes, then each gram's hash is two multiplies from the prefix table
  * (h(s..e) = P[e+1] − P[s]·B^(e−s+1) mod M, same B = 257 / M = 2³¹ − 1
  * as winnow_fp — intermediates < 2⁶², overflow-free in both engines,
  * though the oracle never needs h: it groups by the gram string itself).
  * Fewer than `n` tokens → empty array; null text → null. Runs inside
  * whole-stage codegen via the static helper (the WinnowFingerprints
  * pattern).
  */
case class TokenNgrams(child: Expression, n: Int)
  extends UnaryExpression with Serializable {

  require(n >= 1, "token n-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ngrams needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenNgrams {
  import WinnowFingerprints.{B, M}

  def compute(text: UTF8String, n: Int): ArrayData = {
    // code points, like winnow_fp: DuckDB's text[i] sees code points
    val s = text.toString
    val len = s.length
    val ncp = s.codePointCount(0, len)
    val cps = new Array[Int](ncp)
    var ci = 0; var off = 0
    while (off < len) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }

    // token boundaries: starts[k] / ends[k] of the k-th maximal
    // non-space run (code-point offsets, ends inclusive)
    val starts = new Array[Int](ncp)
    val ends = new Array[Int](ncp)
    var ntok = 0
    var i = 0
    while (i < ncp) {
      if (cps(i) != ' ') {
        if (i == 0 || cps(i - 1) == ' ') { starts(ntok) = i; ntok += 1 }
        if (i == ncp - 1 || cps(i + 1) == ' ') ends(ntok - 1) = i
      }
      i += 1
    }
    if (ntok < n) return new GenericArrayData(Array.empty[Any])

    // prefix hashes P[t] = h(cps[0..t-1]) and powers B^t, both mod M
    val pref = new Array[Long](ncp + 1)
    val pow = new Array[Long](ncp + 1)
    pow(0) = 1L
    var t = 0
    while (t < ncp) {
      pref(t + 1) = (pref(t) * B + cps(t)) % M
      pow(t + 1) = pow(t) * B % M
      t += 1
    }

    val out = new Array[Any](ntok - n + 1)
    var k = 0
    while (k <= ntok - n) {
      val gs = starts(k)
      val ge = ends(k + n - 1)
      val h = ((pref(ge + 1) - pref(gs) * pow(ge - gs + 1) % M) % M + M) % M
      out(k) = new GenericInternalRow(Array[Any](gs, ge, h))
      k += 1
    }
    new GenericArrayData(out)
  }
}
