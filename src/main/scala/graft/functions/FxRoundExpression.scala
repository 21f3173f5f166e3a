package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen form of [[Fx.fx]] — cross-engine-deterministic
  * fixed-point presentation rounding, `sign(x)·floor(|x|·10^d + 0.5)
  * / 10^d` with NaN/±Inf passthrough.
  *
  * Why an Expression and not the Column composition: the composed form
  * (`when(isnan(c) || …, c).otherwise(sign(c) * floor(abs(c)·p + .5)
  * / p)`) references its input FIVE times, and Catalyst duplicates the
  * child expression tree at each reference. For cheap children that is
  * noise; for the similarity hot paths the child is a 64-element
  * cosine/dot fold, and the duplication measured as a 1.4–2.3× bench
  * regression on q51/q52/q128 when the fx sweep first landed. Here the
  * child is evaluated exactly once in both the interpreted and the
  * generated path.
  *
  * Magnitude bound: for |x|·10^d ≥ 2^63 the `(long)` cast saturates at
  * Long.MaxValue while DuckDB's `CAST(... AS BIGINT)` in `fxSql` raises
  * an out-of-range error — the two fx spellings diverge (silent clamp
  * here vs oracle crash there); and past 2^53 the double mantissa can
  * no longer represent every integer, so the +0.5/floor step loses
  * exactness in BOTH engines. fx is a PRESENTATION round for values in
  * human ranges (money, distances, scores scaled by ≤10^9); columns
  * that can exceed ~9.2·10^(18−d) must be pre-quantized (integer cents
  * pattern, Relational.scala) instead of fx-rounded.
  *
  * Arithmetic is IEEE-step-for-step identical to the Column form (abs,
  * ·p, +0.5, floor→long, sign flip in long, long/double divide), so
  * swapping the implementations changes no result bit. Null in → null
  * out (UnaryExpression's null-safe scaffolding), matching the
  * composed form's null propagation.
  */
case class FxRound(child: Expression, digits: Int)
  extends UnaryExpression with Serializable {

  require(digits >= 0 && digits <= 9, s"fx digits out of range: $digits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fx_round needs a double arg, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "fx_round"

  private val p: Double = math.pow(10, digits)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else {
      val m = math.floor(math.abs(x) * p + 0.5).toLong
      (if (x < 0) -m else m) / p
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("fxm")
      s"""
         |if (Double.isNaN($c) || Double.isInfinite($c)) {
         |  ${ev.value} = $c;
         |} else {
         |  long $m = (long) Math.floor(Math.abs($c) * ${p}D + 0.5D);
         |  ${ev.value} = ($c < 0.0D ? -$m : $m) / ${p}D;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FxRound =
    copy(child = newChild)
}
