package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup stage of a web-corpus
  * pipeline (Common Crawl curation dedups by canonical URL before any
  * content pass: it is free compared to text dedup and removes the
  * recrawl/tracking-link bulk). One logical page is reached through
  * cosmetically different URLs; canonicalization collapses them:
  *
  *   - scheme and host lowercase (RFC 3986 §6.2.2.1 case
  *     normalization); the PATH keeps its case (semantically
  *     significant);
  *   - fragment dropped (never sent to the server);
  *   - default ports stripped (:80 for http, :443 for https — RFC 3986
  *     §6.2.3); non-default ports kept;
  *   - trailing path slash dropped (except the root path itself);
  *   - tracking query parameters removed (utm_*, fbclid, gclid — the
  *     advertising-attribution family that never changes content);
  *   - remaining query parameters SORTED (param order is
  *     server-insensitive for the overwhelming majority of pages; the
  *     canonical form must be order-stable to work as a dedup key).
  *
  *   - percent-encoding normalized (RFC 3986 §6.2.2.2): escapes of
  *     UNRESERVED characters decoded (`%7E` → `~`, `%41` → `A`), all
  *     other escapes' hex uppercased (`%2f` → `%2F`); malformed
  *     escapes (`%zz`, dangling `%`) pass through untouched;
  *   - internationalized hosts mapped to their ASCII punycode form
  *     (RFC 3490: `bücher.example` ≡ `xn--bcher-kva.example`) via the
  *     native idn_ascii expression — the ONE non-builtin step, since
  *     punycode has no string-algebra form; pure-ASCII hosts never
  *     reach it.
  *
  * Composed codegen builtins (substring_index / split / filter /
  * array_sort / transform), each with an exact DuckDB twin, so the
  * canonical string is oracle-reproducible (for IDN, DuckDB has no
  * punycode — oracles supply the fixture's host vocabulary as a
  * replace mapping; ASCII hosts replay exactly). Input contract:
  * absolute http(s) URLs (`scheme://host[:port][/path][?query]
  * [#frag]`); a malformed value canonicalizes to whatever the string
  * algebra yields rather than throwing — curation drops junk rows by
  * validity elsewhere (q136's reader), canonicalization must stay
  * total and map-only at 100 TB.
  */
object UrlCanonical {

  /** Unreserved codepoints (RFC 3986 §2.3): ALPHA / DIGIT / - . _ ~ —
    * the escapes that decode; everything else only uppercases. */
  private def isUnreserved(v: Column): Column =
    v.between(48, 57) || v.between(65, 90) || v.between(97, 122) ||
      v.isin(45, 46, 95, 126)

  /** Percent-encoding normalization as pure string algebra: mark every
    * '%' with a \u0002 sentinel, split on the sentinel — every piece
    * after the head then STARTS with '%' iff it is an escape candidate
    * — and transform each piece (decode unreserved / uppercase hex /
    * leave malformed), then rejoin. Map-only, same shape in DuckDB.
    *
    * A PRE-EXISTING \\u0002 in the input is consumed by the split —
    * both engines apply the identical algebra, so the gate cannot
    * diverge, but a URL genuinely containing that control byte (no RFC
    * 3986 URL can: controls are not in any production) would lose it;
    * junk-in, junk-keyed-consistently-out, the module's stated
    * malformed-input posture. */
  def percentNormalize(url: Column): Column = {
    val pieces = split(regexp_replace(url, "%", "\u0002%"), "\u0002")
    val normalized = array_join(transform(pieces, p => {
      val hex = substring(p, 2, 2)
      val isEsc = startswith(p, lit("%")) && hex.rlike("^[0-9a-fA-F]{2}$")
      val v = conv(hex, 16, 10).cast("int")
      val tail = expr_substr(p, 4)
      when(!isEsc, p)
        .when(isUnreserved(v), concat(call_function("char", v), tail))
        .otherwise(concat(lit("%"), upper(hex), tail))
    }), "")
    // fast path: most real URLs carry no escapes at all - skip the
    // split/transform entirely. Identity-preserving (the transform is a
    // no-op without '%'), so the DuckDB twin needs no branch.
    when(!url.contains("%"), url).otherwise(normalized)
  }

  /** substr(p, from) to end of string, 1-based (Column form). */
  private def expr_substr(p: Column, from: Int): Column =
    p.substr(lit(from), greatest(length(p) - lit(from - 1), lit(0)))

  /** substr(p, from) to end of string, 1-based, Column `from`. */
  private[text] def substrFrom(p: Column, from: Column): Column =
    p.substr(from, greatest(length(p) - from + lit(1), lit(0)))

  /** The canonical HOST of a url — the per-domain grouping/cap key
    * (C4/CCNet-style domain quotas, host-level crawl stats). Derived
    * from [[canonicalize]]'s output by string algebra, so the host is
    * normalized exactly once and the two can never disagree. */
  def hostOf(url: Column): Column = hostOfCanon(canonicalize(url))

  /** [[hostOf]] over an ALREADY-canonical url (skips the redundant
    * re-canonicalization when the caller holds [[canonicalize]]'s
    * output — the q150/q151 edge chain). Splits at the FIRST '://':
    * a query embedding an absolute URL (redirect/tracking params —
    * `?next=http://b.com/x`) must not leak the embedded host
    * (ADVICE r15). The authority ends at the first '/' OR '?'. */
  def hostOfCanon(canon: Column): Column = {
    val rest = substrFrom(canon,
      length(substring_index(canon, "://", 1)) + lit(4))
    substring_index(substring_index(
      substring_index(rest, "/", 1), "?", 1), ":", 1)
  }

  /** DuckDB twin of [[hostOfCanon]] over a `canon` column (apply AFTER
    * [[duckCanonCtes]]'s final CTE). */
  def duckHostOf(canonExpr: String): String =
    s"string_split(string_split(string_split(substr($canonExpr, " +
      s"length(string_split($canonExpr, '://')[1]) + 4), '/')[1], '?')[1], ':')[1]"

  /** The canonical form of `url` as a Column. Map-only. */
  def canonicalize(url: Column): Column = {
    // percent-normalization first: decoding unreserved escapes can
    // never produce a delimiter (reserved chars stay encoded), so the
    // parse below sees the normalized spelling
    val noFrag = substring_index(percentNormalize(url), "#", 1)
    // split at the FIRST '://' — substring_index(…, -1) took the LAST,
    // so a query embedding an absolute URL (?next=http://b.com/x)
    // re-rooted the whole parse on the embedded host (ADVICE r15)
    val schemeRaw = substring_index(noFrag, "://", 1)
    val scheme = lower(schemeRaw)
    val rest = substrFrom(noFrag, length(schemeRaw) + lit(4))
    // the authority ends at the first '/' OR the first '?' (a query
    // may follow an empty path: http://h?q=1 — reachable through
    // RFC 3986 §5 reference resolution of "?q=1" against a root URL)
    val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
    val hostLower = lower(substring_index(hostport, ":", 1))
    val host = when(hostLower.rlike("^[\\x00-\\x7F]*$"), hostLower)
      .otherwise(graft.functions.IdnAscii.idnAscii(hostLower))
    val port = when(hostport.contains(":"),
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val keepPort = (port =!= "") &&
      !((scheme === "http") && (port === "80")) &&
      !((scheme === "https") && (port === "443"))
    val pathq = substrFrom(rest, length(hostport) + lit(1))
    val path0 = substring_index(pathq, "?", 1)
    val path1 = when(length(path0) > 1 && endswith(path0, lit("/")),
      substr(path0, lit(1), length(path0) - lit(1))).otherwise(path0)
    // RFC 3986 §6.2.3 scheme-based normalization: an empty path is
    // equivalent to "/" for http(s) — http://h ≡ http://h/
    val path = when(path1 === "", lit("/")).otherwise(path1)
    // everything after the FIRST '?' (substring_index(…, -1) broke on
    // queries whose parameter values embed a second '?')
    val q0 = when(pathq.contains("?"),
      substrFrom(pathq, length(path0) + lit(2))).otherwise(lit(""))
    val params = filter(split(q0, "&"), p =>
      p =!= "" && !startswith(p, lit("utm_")) &&
        !startswith(p, lit("fbclid=")) && !startswith(p, lit("gclid=")))
    val sortedQ = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** The identical algebra as a DuckDB CTE chain over a relation that
    * carries (`idCol`, `url`) — the oracle spelling, kept adjacent so
    * the two cannot drift apart. Appends CTEs `u0..u4` and exposes
    * `u4 (idCol, canon)`. DuckDB twins used: substring_index ↔
    * string_split(...)[1]/[-1] (both return the whole string when the
    * separator is absent), filter ↔ list_filter, array_sort ↔
    * list_sort, endswith ↔ LIKE '%/', the \\u0002-sentinel percent
    * algebra ↔ list_transform, conv ↔ ('0x'||hh)::INT.
    *
    * `idnVocab`: DuckDB has no punycode, so oracles over fixtures with
    * internationalized hosts pass the (unicode-lowercase → punycode)
    * label pairs here; they replay as replace() on the lowered host.
    * ASCII hosts replay exactly with no vocabulary. */
  def duckCanonCtes(inputCte: String, idCol: String,
                    idnVocab: Seq[(String, String)] = Nil,
                    prefix: String = "u"): String = {
    val hh = "substr(p, 2, 2)"
    val code = s"('0x' || $hh)::INT"
    val hostExpr = idnVocab.foldLeft("lower(string_split(hp, ':')[1])") {
      case (acc, (u, puny)) => s"replace($acc, '$u', '$puny')"
    }
    val P = prefix
    // parse mirrors canonicalize exactly: FIRST-'://' split (rst =
    // substr past the first scheme separator, never string_split[-1]),
    // authority ends at the first '/' or '?', query = everything after
    // the FIRST '?', empty path ≡ '/' (§6.2.3)
    s"""${P}0 AS (
       |  SELECT $idCol, array_to_string(list_transform(
       |    string_split(replace(url, '%', chr(2) || '%'), chr(2)),
       |    p -> CASE
       |      WHEN NOT (starts_with(p, '%')
       |                AND regexp_matches($hh, '^[0-9a-fA-F]{2}$$'))
       |        THEN p
       |      WHEN ($code BETWEEN 48 AND 57) OR ($code BETWEEN 65 AND 90)
       |        OR ($code BETWEEN 97 AND 122) OR $code IN (45, 46, 95, 126)
       |        THEN chr($code) || substr(p, 4)
       |      ELSE '%' || upper($hh) || substr(p, 4)
       |    END), '') AS url
       |  FROM $inputCte),
       |${P}1 AS (
       |  SELECT $idCol, string_split(url, '#')[1] AS nf FROM ${P}0),
       |${P}2 AS (
       |  SELECT $idCol, lower(string_split(nf, '://')[1]) AS scheme,
       |    substr(nf, length(string_split(nf, '://')[1]) + 4) AS rst,
       |    string_split(string_split(substr(nf,
       |      length(string_split(nf, '://')[1]) + 4), '/')[1], '?')[1] AS hp
       |  FROM ${P}1),
       |${P}3 AS (
       |  SELECT $idCol, scheme,
       |    $hostExpr AS host,
       |    CASE WHEN contains(hp, ':') THEN string_split(hp, ':')[-1]
       |         ELSE '' END AS port,
       |    string_split(substr(rst, length(hp) + 1), '?')[1] AS p0,
       |    CASE WHEN contains(substr(rst, length(hp) + 1), '?')
       |         THEN substr(substr(rst, length(hp) + 1),
       |           length(string_split(substr(rst, length(hp) + 1), '?')[1]) + 2)
       |         ELSE '' END AS q0
       |  FROM ${P}2),
       |${P}4 AS (
       |  SELECT $idCol,
       |    scheme || '://' || host ||
       |    CASE WHEN port <> ''
       |          AND NOT (scheme = 'http' AND port = '80')
       |          AND NOT (scheme = 'https' AND port = '443')
       |         THEN ':' || port ELSE '' END ||
       |    CASE WHEN p0 = '' THEN '/'
       |         WHEN length(p0) > 1 AND p0 LIKE '%/'
       |         THEN substr(p0, 1, length(p0) - 1) ELSE p0 END ||
       |    CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon
       |  FROM (
       |    SELECT *, array_to_string(list_sort(list_filter(
       |        string_split(q0, '&'),
       |        pp -> pp <> '' AND NOT starts_with(pp, 'utm_')
       |              AND NOT starts_with(pp, 'fbclid=')
       |              AND NOT starts_with(pp, 'gclid='))), '&') AS sq
       |    FROM ${P}3))""".stripMargin
  }
}
