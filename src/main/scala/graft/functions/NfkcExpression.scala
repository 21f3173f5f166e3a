package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization (compatibility decomposition + canonical
  * composition) — the text-cleanup stage every CCNet-style curation
  * pipeline runs before tokenization: ligatures (ﬁ → fi), full-width
  * forms (Ａ → A), squared/unit glyphs (㎞ → km), superscripts
  * (x² → x2) all collapse to their compatibility equivalents, so the
  * tokenizer and the dedup chain see ONE spelling per logical text.
  *
  * A native codegen expression (one static call to
  * `java.text.Normalizer`) because no builtin composition can express
  * the Unicode normalization algorithm. Already-NFKC strings are
  * detected by the library's quick-check (`isNormalized`, O(n) with no
  * allocation) — the overwhelmingly common case on mostly-ASCII
  * corpora returns the input untouched.
  */
case class Nfkc(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfkc"

  override def nullSafeEval(s: Any): Any =
    Nfkc.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfkc.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Nfkc {
  import java.text.Normalizer

  /** Static helper the generated code calls. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }

  /** Column-API entry point (requires GraftExtensions registration). */
  def nfkc(text: Column): Column =
    org.apache.spark.sql.functions.call_function("nfkc", text)
}
