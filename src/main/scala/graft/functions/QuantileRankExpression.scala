package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression `quantile_rank(value, boundaries)` —
  * upper-bound binary search of a double against a SORTED boundary
  * array literal: returns the number of boundaries ≤ value, a rank in
  * `[0, boundaries.length]`.
  *
  * This is the rank primitive behind quantile-based z-order clustering
  * ([[graft.sources.ZOrder]]): linear min/max quantization collapses a
  * skewed column's mass into a handful of ranks (the web-scale norm —
  * one heavy-hitter value and a long tail), while range-rank
  * quantization spreads it evenly — the Delta/Iceberg OPTIMIZE ZORDER
  * approach. A composed `aggregate(boundaries, ...)` fold would be an
  * interpreted higher-order function scanning all B boundaries per row;
  * this is one O(log B) primitive loop fused into whole-stage codegen.
  *
  * The boundary array must be FOLDABLE (a plan literal — the fitted
  * model, not data): it is evaluated once at codegen/first-eval time.
  * Duplicate boundaries are tolerated (upper-bound search is
  * deterministic under duplicates); an EMPTY array ranks everything 0;
  * a null value OR null boundary literal yields null (the expression is
  * null-intolerant) — callers coalesce to the curve origin.
  */
case class QuantileRank(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantile_rank"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "quantile_rank boundaries must be a literal (the fitted model)")
    else super.checkInputDataTypes()

  // evaluated once (foldable): the fitted boundary model as a primitive
  // array — shared by interpreted eval and the codegen reference object
  @transient private lazy val bounds: Array[Double] =
    right.eval() match {
      case null => Array.emptyDoubleArray
      case a: ArrayData => a.toDoubleArray()
    }

  override def nullSafeEval(value: Any, boundaries: Any): Any =
    QuantileRank.rank(value.asInstanceOf[Double], bounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantileBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, (v, _) => s"graft.functions.QuantileRank.rank($v, $ref)")
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
}
