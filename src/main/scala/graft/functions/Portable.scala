package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column helpers whose results are reproducible bit-for-bit (or to a
  * declared rounding) in DuckDB SQL — the portability contract that makes
  * the driver's oracle hash-compare meaningful.
  *
  * Everything here composes built-in, codegen'd Catalyst expressions;
  * no UDFs (SURVEY.md §4: reference parity needs zero custom expressions,
  * and composed built-ins stay inside WholeStageCodegen).
  */
object Portable {

  /** Deterministic 60-bit hash of a string: the first 15 hex digits of
    * md5, as a non-negative Long.
    *
    * DuckDB mirror: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    * 60 bits keeps the value positive in signed 64-bit on both engines.
    * This is the seed hash under minhash/simhash/fingerprinting; all
    * derived hash families must stay inside non-negative 63-bit math so
    * the two engines agree (no unsigned wraparound anywhere).
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** Affine re-hash family over h60, mod a Mersenne prime: the classic
    * minhash permutation h_i(x) = (a_i*x + b_i) mod p with p = 2^31-1.
    * Inputs are first reduced mod p so a_i * x stays < 2^62 (no overflow
    * on either engine). DuckDB mirror: `((a * (h % p) + b) % p)`.
    */
  val MersenneP: Long = 2147483647L // 2^31 - 1
  def affine(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % MersenneP) + lit(b)) % MersenneP

  /** Great-circle distance in meters (haversine), R = 6371000 — the
    * reference's constant (etl-olho-vivo-velocidades-medias.py:34–58).
    * Null-propagating through ordinary expression null semantics, which
    * replaces the reference's explicit None checks (velocidades:36–37).
    *
    * DuckDB mirror (identical formula, same function names):
    *   2*6371000*atan2(sqrt(a), sqrt(1-a)) with
    *   a = sin(dlat/2)^2 + cos(lat1)*cos(lat2)*sin(dlon/2)^2
    * Trig differs between JVM Math and libm in the last ulp, so any
    * cross-engine comparison must round (the reference itself rounds
    * distance to 2 decimals — velocidades:121).
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(2.0 * 6371000.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Exact floor division of a long column by a positive long constant,
    * in pure integer math (no double rounding, sign-correct for negative
    * dividends, exact beyond 2^53). `pmod` makes the numerator an exact
    * non-negative-remainder multiple, so integral `div` truncation IS
    * floor. DuckDB mirror: `(x - ((x % d) + d) % d) // d`. */
  def floorDiv(c: Column, d: Long): Column = {
    require(d > 0, "divisor must be positive")
    val x = c.cast(LongType)
    call_function("div", x - pmod(x, lit(d)), lit(d))
  }

  /** 30-minute bucket start, in epoch seconds, from an epoch-seconds
    * column (reference E2, velocidades:26–31). Pure integer math — exact
    * on both engines, floor (not truncate-toward-zero) for pre-epoch
    * timestamps. DuckDB: `(ts_sec // 1800) * 1800` (positive domain;
    * portable general form `ts - ((ts % 1800) + 1800) % 1800`). */
  def bucket30mStart(tsSec: Column): Column = {
    val x = tsSec.cast(LongType)
    x - pmod(x, lit(1800L))
  }

  /** The reference's interval label `"HH:mm-HH:mm"` for a 30-minute
    * bucket (velocidades:26–31): label of [start, start+1800).
    * DuckDB: strftime(to_timestamp(s), '%H:%M') || '-' ||
    *         strftime(to_timestamp(s+1800), '%H:%M')  (UTC both sides). */
  def interval30Label(bucketStartSec: Column): Column =
    concat(
      date_format(timestamp_seconds(bucketStartSec), "HH:mm"),
      lit("-"),
      date_format(timestamp_seconds(bucketStartSec + 1800), "HH:mm"))

  /** Whitespace tokenizer shared with the oracle. Trailing/leading
    * whitespace produces empty strings on both engines → filter them.
    * DuckDB: list_filter(string_split_regex(text,'\s+'), x -> x <> '') */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")
}
