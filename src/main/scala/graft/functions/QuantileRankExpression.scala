package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `quantile_rank(value, boundaries)` —
  * upper-bound binary search against a SORTED boundary array literal:
  * returns the number of boundaries ≤ value, a rank in
  * `[0, boundaries.length]`. Two typings: `(double, array<double>)`
  * and `(string, array<string>)` — string order is UTF8String binary
  * (byte) order, the same order Spark sorts and parquet min/max stats
  * use, so string ranks cluster exactly the ranges a reader prunes on.
  *
  * This is the rank primitive behind quantile-based z-order clustering
  * ([[graft.sources.ZOrder]]): linear min/max quantization collapses a
  * skewed column's mass into a handful of ranks (the web-scale norm —
  * one heavy-hitter value and a long tail), while range-rank
  * quantization spreads it evenly — the Delta/Iceberg OPTIMIZE ZORDER
  * approach; and linear quantization cannot rank strings at all. A
  * composed `aggregate(boundaries, ...)` fold would be an interpreted
  * higher-order function scanning all B boundaries per row; this is
  * one O(log B) primitive loop fused into whole-stage codegen.
  *
  * The boundary array must be FOLDABLE (a plan literal — the fitted
  * model, not data): it is evaluated once at codegen/first-eval time.
  * Duplicate boundaries are tolerated (upper-bound search is
  * deterministic under duplicates); an EMPTY array ranks everything 0;
  * a null value OR null boundary literal yields null (the expression is
  * null-intolerant) — callers coalesce to the curve origin. No implicit
  * casts: callers cast the value to double/string explicitly.
  */
case class QuantileRank(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantile_rank"

  private def fail(msg: String) =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(msg)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!right.foldable)
      fail("quantile_rank boundaries must be a literal (the fitted model)")
    else (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => fail(
        s"quantile_rank needs (double, array<double>) or (string, array<string>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  // evaluated once (foldable): the fitted boundary model as a primitive
  // array — shared by interpreted eval and the codegen reference object
  // a null ELEMENT is a malformed model (SQL `array(1.0, NULL)` passes
  // the type check — containsNull is not constrained there): fail once
  // with a clear message instead of an opaque NPE out of toDoubleArray
  // (numeric) or a per-row NPE in the comparison loop (string)
  private def requireNoNullBounds(a: ArrayData): ArrayData = {
    require((0 until a.numElements()).forall(i => !a.isNullAt(i)),
      "quantile_rank boundaries must not contain null")
    a
  }
  @transient private lazy val numBounds: Array[Double] =
    right.eval() match {
      case null => Array.emptyDoubleArray
      case a: ArrayData => requireNoNullBounds(a).toDoubleArray()
    }
  @transient private lazy val strBounds: Array[UTF8String] =
    right.eval() match {
      case null => Array.empty[UTF8String]
      case a: ArrayData =>
        (0 until requireNoNullBounds(a).numElements()).map(a.getUTF8String).toArray
    }

  private def isString: Boolean = left.dataType == StringType

  override def nullSafeEval(value: Any, boundaries: Any): Any =
    if (isString) QuantileRank.rankString(value.asInstanceOf[UTF8String], strBounds)
    else QuantileRank.rank(value.asInstanceOf[Double], numBounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString) {
      // Java SOURCE syntax for the array type — classOf[...].getName
      // would yield the JVM binary name "[L...;" and break compilation
      val ref = ctx.addReferenceObj("quantileStrBounds", strBounds,
        classOf[UTF8String].getName + "[]")
      defineCodeGen(ctx, ev, (v, _) =>
        s"graft.functions.QuantileRank.rankString($v, $ref)")
    } else {
      val ref = ctx.addReferenceObj("quantileBounds", numBounds, "double[]")
      defineCodeGen(ctx, ev, (v, _) =>
        s"graft.functions.QuantileRank.rank($v, $ref)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantileRank {
  /** Upper-bound binary search: #{i : bounds(i) <= v}. Deterministic
    * under duplicate boundaries (always the first index > v). */
  def rank(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** String variant — UTF8String binary order (Spark's sort order). */
  def rankString(v: UTF8String, bounds: Array[UTF8String]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
