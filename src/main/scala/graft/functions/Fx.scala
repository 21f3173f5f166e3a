package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic presentation rounding — the q97 pattern
  * (Temporal.scala) generalized so every gate query can use it.
  *
  * Why `round(doubleExpr, d)` is an oracle hazard even when applied on
  * BOTH sides: for the *same* input double, Spark rounds the shortest
  * decimal representation (BigDecimal.valueOf) while DuckDB rounds the
  * binary value — a mean landing on a `…5` decimal boundary splits them
  * (observed at sf0.1: 49.19125 → 49.1913 vs 49.1912). Separately, a
  * tiny negative value rounds to `-0.0` in DuckDB but `+0.0` in Spark,
  * and `repr()` in the driver's hash distinguishes the two.
  *
  * [[fx]] instead presents x as `sign(x) · floor(|x|·10^d + 0.5) / 10^d`
  * with the numerator in INTEGER units: every step (IEEE multiply, add,
  * floor, long cast, long→double divide) is bit-deterministic and
  * identical across engines, so identical input doubles ALWAYS present
  * identically — and the integer numerator can never be `-0.0`.
  * [[fxSql]] is the DuckDB spelling of the same arithmetic; use the two
  * in lockstep (they define the column's value, so both sides must
  * agree on the formula, not just the intent).
  *
  * Semantics vs round(): half-away-from-zero on the BINARY value. For a
  * double infinitesimally below a decimal boundary (2.675 is really
  * 2.67499…) fx gives 2.67 where Spark's round gives 2.68 — both are
  * defensible presentations; what matters for the gate is that the two
  * engines agree, which fx guarantees and round() does not.
  *
  * Residual (documented, not closable at the presentation layer): if
  * the two engines compute *different* input doubles (an order-dependent
  * float sum straddling a boundary), no presentation function can agree.
  * Closing that class requires quantizing before aggregation (integer
  * cents — the full q97 posture), applied where the data's decimal width
  * makes it exact. Round 10 applied exactly that to every LARGE-n money
  * sum (q01/q03/q09/q10/q16/q17/q29 and the sum_price entries: all 2-dec
  * columns, summed as exact cent longs, means as sum/count — never
  * avg(), whose Spark implementation accumulates doubles). What remains
  * on float sums is small-n only (per-session/per-window value sums,
  * tens of addends, ~1e-13 accumulated error) plus the nonlinear
  * co-moment aggregates (corr/covar/stddev), whose merge order cannot
  * be integerized.
  *
  * NaN/±Inf pass through unchanged ([[fx]] guards; DuckDB would error on
  * CAST(NaN AS BIGINT), so [[fxSql]] mirrors the guard) — the strict
  * OlhoVivo speed pipeline (trap ⑤) deliberately carries them.
  *
  * The codebase-wide sweep (round 10) left exactly three `round()`
  * categories in place, each deliberately NOT an fx candidate:
  *  1. DECIMAL-typed rounds (q103, ScaleOps.scala) — exact decimal
  *     arithmetic on both engines, no binary-double hazard, and fx
  *     would force a lossy cast to double;
  *  2. integer quantizers `round(x * 100)` on ≤2-decimal data (q115) —
  *     the argument lands within an ulp of an integer, never near a
  *     .5 boundary, so both engines agree by construction;
  *  3. the reference's OWN round(2) inside the speed pipeline (E5,
  *     SpeedPipeline.scala:100 / posCte / q100) — reference semantics,
  *     replicated with the same spelling on both sides.
  */
object Fx {

  private def pow10(d: Int): Double = {
    require(d >= 0 && d <= 9, s"fx digits out of range: $d")
    math.pow(10, d)
  }

  /** Present double column `c` rounded half-away-from-zero at `d`
    * decimal digits, deterministically across engines. Delegates to the
    * native [[FxRound]] codegen expression: the composed Column form
    * (`when(isnan(c)||…, c).otherwise(sign·floor(abs(c)·p+.5)/p)`)
    * references `c` five times and Catalyst duplicates the child tree
    * at each reference — a measured 1.4–2.3× regression on the cosine
    * hot paths (q51/q52/q128). The expression evaluates `c` once;
    * the arithmetic is IEEE-step-identical, so no result bit changes.
    * The cast is a no-op for doubles and lets integer-typed inputs
    * coerce as the Column form did. */
  def fx(c: Column, d: Int): Column = {
    pow10(d) // range check at construction, same contract as before
    call_function("fx_round", c.cast("double"), lit(d))
  }

  /** DuckDB spelling of [[fx]] for oracle SQL. `e` is substituted
    * textually (kept simple: it is evaluated several times). */
  def fxSql(e: String, d: Int): String = {
    // divide by an explicit DOUBLE: a bare 100.0 literal is DECIMAL in
    // both engines' parsers, and BIGINT/DECIMAL division changes the
    // result type (Spark keeps DecimalType; the driver compares repr())
    val p = s"CAST(${pow10(d).toLong} AS DOUBLE)"
    s"(CASE WHEN isnan($e) OR isinf($e) THEN ($e) ELSE " +
      s"(CASE WHEN ($e) < 0 THEN -1 ELSE 1 END) * " +
      s"CAST(floor(abs($e) * $p + 0.5) AS BIGINT) / $p END)"
  }

  /** Engine-portable spelling — ONE text that parses identically in
    * Spark SQL and DuckDB, for the "same statement serves both engines"
    * entries (q16/q17/q101/q102). No NaN/Inf guard (Spark lacks isinf;
    * DuckDB errors on CAST(NaN AS BIGINT)) — only for expressions that
    * cannot produce them. */
  def fxSqlPortable(e: String, d: Int): String = {
    val p = s"CAST(${pow10(d).toLong} AS DOUBLE)"
    s"((CASE WHEN ($e) < 0 THEN -1 ELSE 1 END) * " +
      s"CAST(floor(abs($e) * $p + 0.5) AS BIGINT) / $p)"
  }
}
