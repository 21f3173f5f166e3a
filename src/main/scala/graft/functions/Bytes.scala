package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-space byte assembly — build binary payloads (format headers,
  * fixed-width integer fields) from numeric columns with nothing but
  * codegen'd built-ins: hex → lpad → byte-swap → unhex. Used by the
  * media roundtrip gates (q61–q63) to synthesize PNG/GIF/WAV/BMP
  * payloads whose expected parse is plain arithmetic.
  *
  * All helpers expect a non-negative value that fits the field; signed
  * fields are the caller's two's complement via pmod (e.g.
  * `leS16`). */
object Bytes {

  /** One byte. */
  def u8(c: Column): Column = unhex(lpad(hex(c), 2, "0"))

  /** Big-endian unsigned 32-bit. */
  def beU32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  private def swapped(hx: Column, bytes: Int): Column =
    concat((1 to bytes).reverse.map(i => substring(hx, i * 2 - 1, 2)): _*)

  /** Little-endian unsigned 16-bit. */
  def leU16(c: Column): Column = unhex(swapped(lpad(hex(c), 4, "0"), 2))

  /** Little-endian SIGNED 16-bit (two's complement via pmod, so
    * negative sample values encode correctly). */
  def leS16(c: Column): Column = leU16(pmod(c, lit(65536L)))

  /** Little-endian unsigned 32-bit. */
  def leU32(c: Column): Column = unhex(swapped(lpad(hex(c), 8, "0"), 4))
}
