package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the compliance pass of a training-data pipeline:
  * mask emails, IPv4 addresses, and phone numbers with typed
  * placeholder tokens, map-only and codegen'd (regexp_replace chain).
  *
  * Patterns are deliberately RE2-safe AND Java-regex-safe (no
  * backreferences, no lookaround, single greedy quantifiers over
  * character classes — shapes where leftmost-first and leftmost-longest
  * matching agree), so the exact same pattern strings run in the DuckDB
  * oracle. Order matters and is fixed: emails first (their digits must
  * not feed the phone pattern), then IPs (dotted digits would otherwise
  * partially match as phones), then phones.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9().\\- ]{6,}[0-9]"

  val EmailToken = "<EMAIL>"
  val IpToken    = "<IP>"
  val PhoneToken = "<PHONE>"

  /** All three masks, in the fixed order documented above. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Occurrences of `token` in `text` — engine-portable match counting
    * (length arithmetic instead of a regexp-count builtin, which the
    * oracle dialect lacks). */
  def tokenCount(text: Column, token: String): Column =
    ((length(text) - length(replace(text, lit(token), lit("")))) /
      token.length).cast("long")
}
