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

  /** A LET-BINDING for column expressions: evaluate `value` once and
    * reference it as a lambda variable inside `body`. Column vals in
    * Scala are TEXTUAL substitution — every use site gets a full copy
    * of the subtree, so chaining canonicalize∘resolve multiplied into
    * a ~10⁶-node expression (planning OOM, found wiring q150). A
    * higher-order-function lambda variable is a true binding (one node
    * per use; Catalyst never inlines lambda variables), at the cost of
    * a one-element array per binding per row — noise next to the regex
    * work these expressions do. */
  private[graft] def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

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
  def hostOfCanon(canon: Column): Column =
    let(canon) { c =>
      val rest = substrFrom(c, length(substring_index(c, "://", 1)) + lit(4))
      substring_index(substring_index(
        substring_index(rest, "/", 1), "?", 1), ":", 1)
    }

  /** DuckDB twin of [[hostOfCanon]] over a `canon` column (apply AFTER
    * [[duckCanonCtes]]'s final CTE). */
  def duckHostOf(canonExpr: String): String =
    s"string_split(string_split(string_split(substr($canonExpr, " +
      s"length(string_split($canonExpr, '://')[1]) + 4), '/')[1], '?')[1], ':')[1]"

  /** The PATH of an already-canonical url (query stripped) — what
    * robots.txt rules match against. Canonical paths always start with
    * '/' (§6.2.3 normalization), so the result is never empty. */
  def pathOfCanon(canon: Column): Column =
    let(canon) { c =>
      let(substrFrom(c, length(substring_index(c, "://", 1)) + lit(4))) { rest =>
        val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
        substring_index(substrFrom(rest, length(hostport) + lit(1)), "?", 1)
      }
    }

  /** DuckDB twin of [[pathOfCanon]]. */
  def duckPathOf(canonExpr: String): String = {
    val rest = s"substr($canonExpr, length(string_split($canonExpr, '://')[1]) + 4)"
    val hp = s"string_split(string_split($rest, '/')[1], '?')[1]"
    s"string_split(substr($rest, length($hp) + 1), '?')[1]"
  }

  /** The PATH + QUERY of an already-canonical url (`/a/b?x=1` — the
    * query kept, the fragment already gone from canonical form). This
    * is robots.txt's §2.2.2 match target: query-part rules (wildcard-then-`?` patterns)
    * or `Disallow: /search?q=` match against path-plus-query, so the
    * query-stripped [[pathOfCanon]] could never satisfy them
    * (ADVICE r16). */
  def pathQueryOfCanon(canon: Column): Column =
    let(canon) { c =>
      let(substrFrom(c, length(substring_index(c, "://", 1)) + lit(4))) { rest =>
        val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
        substrFrom(rest, length(hostport) + lit(1))
      }
    }

  /** DuckDB twin of [[pathQueryOfCanon]]. */
  def duckPathQueryOf(canonExpr: String): String = {
    val rest = s"substr($canonExpr, length(string_split($canonExpr, '://')[1]) + 4)"
    val hp = s"string_split(string_split($rest, '/')[1], '?')[1]"
    s"substr($rest, length($hp) + 1)"
  }

  // ------------------------------------------------------------------
  // RFC 3986 §5: relative-reference resolution (the crawl-graph step —
  // VERDICT r15 missing #1: real pages link relatively, and without
  // merge + remove_dot_segments there is no link graph)
  // ------------------------------------------------------------------

  /** RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path ('' or
    * '/…'): fold the '/'-split segments with a string-encoded stack —
    * '.' is a no-op, '..' pops one component, anything else (including
    * the empty segments of '//') appends. A trailing '/', '/.', or
    * '/..' leaves a directory path (trailing slash restored after the
    * fold). Map-only; the DuckDB twin is the identical fold via
    * list_reduce. */
  def removeDotSegments(path: Column): Column =
    let(path) { p =>
      let({
        val segs = split(p, "/")
        aggregate(slice(segs, lit(2), greatest(size(segs) - 1, lit(0))), lit(""),
          (acc, s) =>
            when(s === ".", acc)
              .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
              .otherwise(concat(acc, lit("/"), s)))
      }) { folded =>
        let(when(folded === "", lit("/")).otherwise(folded)) { out =>
          val trail = endswith(p, lit("/.")) || endswith(p, lit("/.."))
          when(p === "", lit(""))
            .otherwise(when(trail && !endswith(out, lit("/")),
              concat(out, lit("/"))).otherwise(out))
        }
      }
    }

  /** RFC 3986 §5.2 reference resolution: the absolute URL `ref` points
    * to, against the absolute http(s) `base`. Handles every reference
    * class a crawl page carries — absolute (`http://h/p`),
    * protocol-relative (`//h/p`), root-relative (`/p`), path-relative
    * (`a/../b`, merged against the base directory per §5.2.3),
    * query-only (`?q=1`), fragment-only / empty (the base itself) —
    * with §5.2.4 dot-segment removal on the merged path. Fragments are
    * dropped (this library's canonical posture). The output keeps the
    * base's RAW spelling (case, IDN, ports); [[canonicalize]] is the
    * normalization stage and callers compose the two. Callers screen
    * non-hierarchical schemes (`mailto:`, `javascript:` — no '://')
    * BEFORE resolving; such refs would otherwise merge as relative
    * paths (the RFC itself requires './'-prefixing a relative segment
    * containing ':'). Map-only. */
  def resolve(base: Column, ref: Column): Column =
    let(substring_index(ref, "#", 1)) { r =>
    let(substring_index(base, "#", 1)) { baseNf =>
    let(substring_index(baseNf, "://", 1)) { bSchemeRaw =>
    let(substrFrom(baseNf, length(bSchemeRaw) + lit(4))) { bAfter =>
    let(substring_index(substring_index(bAfter, "/", 1), "?", 1)) { bAuth =>
    let(substrFrom(bAfter, length(bAuth) + lit(1))) { bPathQ =>
    let(substring_index(bPathQ, "?", 1)) { bPath =>
      val hasScheme = r.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*://")
      val protoRel = startswith(r, lit("//"))
      // §5.2.3 merge: the base path up to (and including) its last '/',
      // or '/' when the base path is empty
      val mergeDir = when(bPath.contains("/"),
        regexp_replace(bPath, "[^/]*$", "")).otherwise(lit("/"))
      val relPathQ = when(r === "", bPathQ)
        .when(startswith(r, lit("?")), concat(bPath, r))
        .when(startswith(r, lit("/")), r)
        .otherwise(concat(mergeDir, r))
      val after0 = when(hasScheme,
          substrFrom(r, length(substring_index(r, "://", 1)) + lit(4)))
        .when(protoRel, substrFrom(r, lit(3)))
        .otherwise(concat(bAuth, relPathQ))
      val scheme = when(hasScheme, substring_index(r, "://", 1))
        .otherwise(bSchemeRaw)
      let(after0) { after =>
      let(substring_index(substring_index(after, "/", 1), "?", 1)) { auth =>
      let(substrFrom(after, length(auth) + lit(1))) { pathQ =>
      let(substring_index(pathQ, "?", 1)) { p0 =>
        val q = substrFrom(pathQ, length(p0) + lit(1)) // '?…' or ''
        concat(scheme, lit("://"), auth, removeDotSegments(p0), q)
      }}}}
    }}}}}}}

  /** The identical §5.2 algebra as DuckDB CTEs over
    * `inputCte ($idCols, base, ref)` → exposes `${prefix}4 ($idCols,
    * target)`. `idCols` may be a comma-joined column list (it is
    * spliced into every SELECT). Twins: the dot-segment fold is
    * list_reduce over the same string-encoded stack (list_prepend('')
    * supplies the fold's init). */
  def duckResolveCtes(inputCte: String, idCols: String,
                      prefix: String = "rv"): String = {
    val P = prefix
    val fold =
      """list_reduce(list_prepend('', p0segs[2:]),
        |      (acc, x) -> CASE WHEN x = '.' THEN acc
        |                       WHEN x = '..' THEN regexp_replace(acc, '/[^/]*$', '')
        |                       ELSE acc || '/' || x END)""".stripMargin
    s"""${P}0 AS (
       |  SELECT $idCols, string_split(ref, '#')[1] AS r,
       |    string_split(base, '#')[1] AS bnf
       |  FROM $inputCte),
       |${P}1 AS (
       |  SELECT $idCols, r,
       |    string_split(bnf, '://')[1] AS bs,
       |    substr(bnf, length(string_split(bnf, '://')[1]) + 4) AS bafter
       |  FROM ${P}0),
       |${P}2 AS (
       |  SELECT $idCols, r, bs,
       |    string_split(string_split(bafter, '/')[1], '?')[1] AS bauth,
       |    substr(bafter,
       |      length(string_split(string_split(bafter, '/')[1], '?')[1]) + 1) AS bpq
       |  FROM ${P}1),
       |${P}3 AS (
       |  SELECT $idCols,
       |    CASE WHEN regexp_matches(r, '^[A-Za-z][A-Za-z0-9+.\\-]*://')
       |         THEN string_split(r, '://')[1] ELSE bs END AS scheme,
       |    CASE WHEN regexp_matches(r, '^[A-Za-z][A-Za-z0-9+.\\-]*://')
       |         THEN substr(r, length(string_split(r, '://')[1]) + 4)
       |         WHEN starts_with(r, '//') THEN substr(r, 3)
       |         ELSE bauth ||
       |           CASE WHEN r = '' THEN bpq
       |                WHEN starts_with(r, '?')
       |                  THEN string_split(bpq, '?')[1] || r
       |                WHEN starts_with(r, '/') THEN r
       |                ELSE (CASE WHEN contains(string_split(bpq, '?')[1], '/')
       |                           THEN regexp_replace(string_split(bpq, '?')[1],
       |                                               '[^/]*$$', '')
       |                           ELSE '/' END) || r END
       |         END AS after
       |  FROM ${P}2),
       |${P}3b AS (
       |  SELECT $idCols, scheme,
       |    string_split(string_split(after, '/')[1], '?')[1] AS auth,
       |    string_split(substr(after,
       |      length(string_split(string_split(after, '/')[1], '?')[1]) + 1),
       |      '?')[1] AS p0,
       |    substr(substr(after,
       |        length(string_split(string_split(after, '/')[1], '?')[1]) + 1),
       |      length(string_split(substr(after,
       |        length(string_split(string_split(after, '/')[1], '?')[1]) + 1),
       |        '?')[1]) + 1) AS q
       |  FROM ${P}3),
       |${P}4 AS (
       |  SELECT $idCols,
       |    scheme || '://' || auth ||
       |    (CASE WHEN p0 = '' THEN ''
       |          ELSE (CASE WHEN (p0 LIKE '%/.' OR p0 LIKE '%/..')
       |                      AND NOT (CASE WHEN folded = '' THEN '/'
       |                               ELSE folded END) LIKE '%/'
       |                     THEN (CASE WHEN folded = '' THEN '/'
       |                           ELSE folded END) || '/'
       |                     ELSE (CASE WHEN folded = '' THEN '/'
       |                           ELSE folded END) END) END) || q AS target
       |  FROM (
       |    SELECT *, $fold AS folded
       |    FROM (SELECT *, string_split(p0, '/') AS p0segs FROM ${P}3b)))""".stripMargin
  }

  /** The canonical form of `url` as a Column. Map-only (intermediates
    * are [[let]]-bound — textual substitution made this a million-node
    * tree when composed with [[resolve]]). */
  def canonicalize(url: Column): Column = {
    // percent-normalization first: decoding unreserved escapes can
    // never produce a delimiter (reserved chars stay encoded), so the
    // parse below sees the normalized spelling
    let(substring_index(percentNormalize(url), "#", 1)) { noFrag =>
    // split at the FIRST '://' — substring_index(…, -1) took the LAST,
    // so a query embedding an absolute URL (?next=http://b.com/x)
    // re-rooted the whole parse on the embedded host (ADVICE r15)
    let(substring_index(noFrag, "://", 1)) { schemeRaw =>
    let(lower(schemeRaw)) { scheme =>
    let(substrFrom(noFrag, length(schemeRaw) + lit(4))) { rest =>
    // the authority ends at the first '/' OR the first '?' (a query
    // may follow an empty path: http://h?q=1 — reachable through
    // RFC 3986 §5 reference resolution of "?q=1" against a root URL)
    let(substring_index(substring_index(rest, "/", 1), "?", 1)) { hostport =>
    let(substrFrom(rest, length(hostport) + lit(1))) { pathq =>
    let(substring_index(pathq, "?", 1)) { path0 =>
      val hostLower = lower(substring_index(hostport, ":", 1))
      val host = let(hostLower)(h =>
        when(h.rlike("^[\\x00-\\x7F]*$"), h)
          .otherwise(graft.functions.IdnAscii.idnAscii(h)))
      val port = when(hostport.contains(":"),
        substring_index(hostport, ":", -1)).otherwise(lit(""))
      val keepPort = let(port)(pt =>
        when((pt =!= "") &&
          !((scheme === "http") && (pt === "80")) &&
          !((scheme === "https") && (pt === "443")),
          concat(lit(":"), pt)).otherwise(lit("")))
      val path1 = when(length(path0) > 1 && endswith(path0, lit("/")),
        substr(path0, lit(1), length(path0) - lit(1))).otherwise(path0)
      // RFC 3986 §6.2.3 scheme-based normalization: an empty path is
      // equivalent to "/" for http(s) — http://h ≡ http://h/
      val path = let(path1)(p1 => when(p1 === "", lit("/")).otherwise(p1))
      // everything after the FIRST '?' (substring_index(…, -1) broke on
      // queries whose parameter values embed a second '?')
      val q0 = when(pathq.contains("?"),
        substrFrom(pathq, length(path0) + lit(2))).otherwise(lit(""))
      val params = filter(split(q0, "&"), p =>
        p =!= "" && !startswith(p, lit("utm_")) &&
          !startswith(p, lit("fbclid=")) && !startswith(p, lit("gclid=")))
      val sortedQ = array_join(array_sort(params), "&")
      concat(
        scheme, lit("://"), host, keepPort, path,
        let(sortedQ)(sq =>
          when(sq =!= "", concat(lit("?"), sq)).otherwise(lit(""))))
    }}}}}}}
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
