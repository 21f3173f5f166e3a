package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fp(text, k, w)` → `array<struct<p:int, h:long>>`: the
  * winnowing fingerprint selection of Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting"
  * (SIGMOD 2003) — the span-level dedup primitive. Every k-gram (in
  * CODE POINTS) gets a polynomial rolling hash; in each window of `w`
  * consecutive hashes the minimal one is selected (ties → rightmost);
  * the distinct selections are the document's fingerprints.
  *
  * Guarantee (the paper's): any substring match of length ≥ w + k − 1
  * between two documents yields at least one common (hash) fingerprint,
  * while no match shorter than k is ever detected — with expected
  * fingerprint density 2/(w+1), i.e. the sketch is ~¼ the size of the
  * full k-gram set at w = 8 and the miss rate for long clones is ZERO,
  * unlike MinHash's probabilistic recall.
  *
  * Engine shape: one O(L) pass per document — rolling hash + monotonic
  * deque for the sliding window minimum — inside whole-stage codegen
  * via a static helper (the MinhashSignature pattern). The selection
  * rule is expressed as a sliding minimum over the COMBINED key
  * h·2²¹ + (2²⁰ − p): keys are unique, so "min hash, rightmost tie"
  * needs no tie logic, and the DuckDB oracle states the identical rule
  * as one window function. The combined key bounds positions at
  * p < 2²⁰ — documents longer than 1 Mi code points are rejected
  * loudly rather than fingerprinted wrongly (shard longer docs first;
  * the 100 TB curation path chunks way below that).
  *
  * Hash: h(gram) = Σ cp_i · B^(k−1−i) mod M, B = 257,
  * M = 2³¹ − 1 — all intermediates < 2⁶² (no overflow on either
  * engine; DuckDB BIGINT errors on overflow rather than wrapping).
  * Documents with fewer than w + k − 1 code points produce no full
  * window and fingerprint to the empty array; null → null.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with Serializable {

  require(k >= 2, "k-gram length must be >= 2")
  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", IntegerType, nullable = false),
                   StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  val M: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  val B: Long = 257L
  val MaxLen: Int = 1 << 20

  /** O(L): rolling k-gram hash + monotonic-deque sliding minimum over
    * the combined key; consecutive windows re-selecting the same
    * position dedupe via the last-emitted check (the argmin index is
    * non-decreasing as the window slides). */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    // code points (not UTF-16 chars): DuckDB's ord() sees code points
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    require(n < MaxLen,
      s"winnow_fp: document has $n code points, limit is ${MaxLen - 1} — shard first")
    val cps = new Array[Int](n)
    var ci = 0; var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    val nh = n - k + 1 // k-gram count
    if (nh < w) return new GenericArrayData(Array.empty[Any])

    // rolling hashes
    var powK1 = 1L // B^(k−1) mod M
    var e = 1
    while (e < k) { powK1 = powK1 * B % M; e += 1 }
    val keys = new Array[Long](nh)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    keys(0) = h * 2097152L + 1048576L
    var p = 1
    while (p < nh) {
      h = ((h - cps(p - 1) * powK1 % M + M) % M * B + cps(p + k - 1)) % M
      keys(p) = h * 2097152L + (1048576L - p)
      p += 1
    }

    // sliding minimum, window w, deque of indices with increasing keys
    val deque = new Array[Int](nh)
    var head = 0; var tail = 0 // [head, tail)
    val out = new java.util.ArrayList[Any]()
    var lastSel = -1
    var i = 0
    while (i < nh) {
      while (tail > head && keys(deque(tail - 1)) > keys(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (sel != lastSel) {
          lastSel = sel
          out.add(new GenericInternalRow(
            Array[Any](sel, keys(sel) / 2097152L)))
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
