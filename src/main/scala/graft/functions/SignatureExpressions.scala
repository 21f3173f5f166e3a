package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the two dedup signature folds. Both
  * consume a precomputed `array<bigint>` hash column (Portable.h60 per
  * shingle / token — md5 stays in the built-in codegen'd path) and
  * replace the interpreted higher-order-function forms in Dedup:
  *
  *  - minhash: `array(array_min(transform(hs, affine_1)), ...,
  *    array_min(transform(hs, affine_k)))` is k separate interpreted
  *    passes (HOFs are CodegenFallback, one lambda dispatch per
  *    element per permutation). Here: ONE pass, k running minima in a
  *    local long[], inside whole-stage codegen.
  *  - simhash: `bits` separate interpreted aggregate() folds become one
  *    pass accumulating all bit counters.
  *
  * At 100 TB the signature stage is pure map-side CPU on every document
  * — the lambda-interpreter overhead is the difference between a
  * scan-bound and a CPU-bound pipeline. Results are bit-identical to
  * the fold forms (same integer math, same traversal order), which
  * DedupSpec asserts, so the DuckDB oracle SQL is unchanged.
  */
object SignatureExpressions

/** `minhash_sig(hashes array<bigint>, k)` → `array<bigint>` of length k:
  * entry i = min over elements h of (a_i * (h mod p) + b_i) mod p with
  * (a_i, b_i) = Dedup.minhashParams. Null elements are skipped
  * (array_min semantics); empty / all-null input → k null entries;
  * null input → null.
  */
case class MinhashSignature(child: Expression, k: Int)
  extends UnaryExpression with Serializable {

  require(k >= 1, "k >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  // (a_i, b_i) as primitive arrays for the hot loop
  @transient private lazy val (paramA, paramB) = {
    val ps = graft.dedup.Dedup.minhashParams(k)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], paramA, paramB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", paramA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", paramB, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSignature.compute($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  private val P = Portable.MersenneP

  /** One pass over the hash array, k running minima. Inputs are reduced
    * mod p first so a*h stays far below 2^63 (identical to
    * Portable.affine / the DuckDB mirror `(a * (h % p) + b) % p`). */
  def compute(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        any = true
        val hm = hashes.getLong(i) % P
        var j = 0
        while (j < k) {
          val v = (a(j) * hm + b(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](k)) // k null entries
  }
}

/** `simhash64(token_hashes array<bigint>, bits)` → bigint: bit b of the
  * result is set iff Σ_tokens (2·((h >>> b) & 1) − 1) > 0. `bits` ≤ 62
  * keeps the value in non-negative signed-64 math (DuckDB parity).
  * Matches the fold form exactly, including edge cases: empty array → 0;
  * any null element → 0 (a null term nulls every aggregate() bit-sum,
  * and `when(null > 0, …).otherwise(0)` yields 0 per bit); null → null.
  */
case class Simhash(child: Expression, bits: Int)
  extends UnaryExpression with Serializable {

  require(bits >= 1 && bits <= 62, "1 <= bits <= 62 (signed-long parity)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash {
  /** One pass, `bits` signed counters. */
  def compute(tokenHashes: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = tokenHashes.numElements()
    var i = 0
    while (i < n) {
      if (tokenHashes.isNullAt(i)) return 0L // fold-form edge case parity
      val h = tokenHashes.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
