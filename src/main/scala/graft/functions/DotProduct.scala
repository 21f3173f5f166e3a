package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType => _, _}

/** Native Catalyst expression for the embedding dot product —
  * `dot_product(array<float|double>, array<float|double>) → double`.
  *
  * This is the hot loop of every similarity operator (cosine top-k,
  * sign-LSH signatures, IVF assignment): the composed
  * `aggregate(zip_with(...))` form is a higher-order function, which
  * Spark evaluates with per-element interpreted lambdas (HOFs are
  * CodegenFallback) — at 100 TB that interpreter overhead dominates the
  * scan. Here the whole product is ONE fused primitive loop inside
  * whole-stage codegen: no lambda dispatch, no boxing, no intermediate
  * zipped array.
  *
  * Semantics mirror the fold exactly (same accumulation order, element
  * 0 → n−1, so results are bit-identical): null array or mismatched
  * lengths or any null element → null; empty arrays → 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<float|double> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  // mismatched lengths / null elements null the result even when both
  // inputs are non-nullable → always use the nullable codegen path
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  @transient private lazy val getL: (ArrayData, Int) => Double = elemType(left) match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case _         => (a, i) => a.getDouble(i)
  }
  @transient private lazy val getR: (ArrayData, Int) => Double = elemType(right) match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case _         => (a, i) => a.getDouble(i)
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += getL(a, i) * getR(b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }
    val (gl, gr) = (getter(elemType(left)), getter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ((double) $a.$gl($i)) * ((double) $b.$gr($i));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
