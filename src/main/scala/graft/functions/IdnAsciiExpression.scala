package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN (internationalized domain name) → ASCII punycode, RFC 3490 via
  * `java.net.IDN` — the host-normalization step of URL canonicalization
  * (RFC 3986 §6.2.2: `bücher.example` and `xn--bcher-kva.example` are
  * one host). A native codegen expression (one static call) because no
  * builtin composition can express the punycode algorithm.
  *
  * TOTAL function: a host the IDN algorithm rejects (empty labels,
  * overlong labels, raw junk) passes through UNCHANGED — curation
  * canonicalization must never throw on crawl junk; invalid hosts stay
  * distinct junk keys, exactly like the rest of UrlCanonical's
  * malformed-input posture.
  */
case class IdnAscii(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "idn_ascii"

  override def nullSafeEval(host: Any): Any =
    IdnAscii.toAscii(host.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdnAscii.toAscii($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IdnAscii {
  /** Static helper the generated code calls. Identity on failure. */
  def toAscii(host: UTF8String): UTF8String = {
    val s = host.toString
    // fast path: pure-ASCII hosts (the overwhelming majority) skip the
    // IDN machinery entirely — and skip its exceptions on junk like
    // empty strings or bare IPs with odd labels
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) host
    else try UTF8String.fromString(java.net.IDN.toASCII(s))
    catch {
      // NonFatal, not just IllegalArgumentException: the JDK IDN/
      // Punycode implementation surfaces index/state errors on some
      // malformed label inputs, and ONE junk URL must never kill a
      // 100 TB canonicalization job (total-function contract)
      case scala.util.control.NonFatal(_) => host
    }
  }

  /** Column-API entry point (requires GraftExtensions registration,
    * like haversine_m). */
  def idnAscii(host: Column): Column =
    org.apache.spark.sql.functions.call_function("idn_ascii", host)
}
