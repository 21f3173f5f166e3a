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
  * Composed codegen builtins only (substring_index / split / filter /
  * array_sort), each with an exact DuckDB twin, so the canonical string
  * is oracle-reproducible. Input contract: absolute http(s) URLs
  * (`scheme://host[:port][/path][?query][#frag]`); a malformed value
  * canonicalizes to whatever the string algebra yields rather than
  * throwing — curation drops junk rows by validity elsewhere (q136's
  * reader), canonicalization must stay total and map-only at 100 TB.
  */
object UrlCanonical {

  /** The canonical form of `url` as a Column. Map-only. */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val host = lower(substring_index(hostport, ":", 1))
    val port = when(hostport.contains(":"),
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val keepPort = (port =!= "") &&
      !((scheme === "http") && (port === "80")) &&
      !((scheme === "https") && (port === "443"))
    val pathq = substr(rest, length(hostport) + lit(1),
      greatest(length(rest) - length(hostport), lit(0)))
    val path0 = substring_index(pathq, "?", 1)
    val path = when(length(path0) > 1 && endswith(path0, lit("/")),
      substr(path0, lit(1), length(path0) - lit(1))).otherwise(path0)
    val q0 = when(pathq.contains("?"),
      substring_index(pathq, "?", -1)).otherwise(lit(""))
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
    * the two cannot drift apart. Appends CTEs `u1..u4` and exposes
    * `u4 (idCol, canon)`. DuckDB twins used: substring_index ↔
    * string_split(...)[1]/[-1] (both return the whole string when the
    * separator is absent), filter ↔ list_filter, array_sort ↔
    * list_sort, endswith ↔ LIKE '%/'. */
  def duckCanonCtes(inputCte: String, idCol: String): String =
    s"""u1 AS (
       |  SELECT $idCol, string_split(url, '#')[1] AS nf FROM $inputCte),
       |u2 AS (
       |  SELECT $idCol, lower(string_split(nf, '://')[1]) AS scheme,
       |    string_split(nf, '://')[-1] AS rst,
       |    string_split(string_split(nf, '://')[-1], '/')[1] AS hp
       |  FROM u1),
       |u3 AS (
       |  SELECT $idCol, scheme,
       |    lower(string_split(hp, ':')[1]) AS host,
       |    CASE WHEN contains(hp, ':') THEN string_split(hp, ':')[-1]
       |         ELSE '' END AS port,
       |    string_split(substr(rst, length(hp) + 1), '?')[1] AS p0,
       |    CASE WHEN contains(substr(rst, length(hp) + 1), '?')
       |         THEN string_split(substr(rst, length(hp) + 1), '?')[-1]
       |         ELSE '' END AS q0
       |  FROM u2),
       |u4 AS (
       |  SELECT $idCol,
       |    scheme || '://' || host ||
       |    CASE WHEN port <> ''
       |          AND NOT (scheme = 'http' AND port = '80')
       |          AND NOT (scheme = 'https' AND port = '443')
       |         THEN ':' || port ELSE '' END ||
       |    CASE WHEN length(p0) > 1 AND p0 LIKE '%/'
       |         THEN substr(p0, 1, length(p0) - 1) ELSE p0 END ||
       |    CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon
       |  FROM (
       |    SELECT *, array_to_string(list_sort(list_filter(
       |        string_split(q0, '&'),
       |        pp -> pp <> '' AND NOT starts_with(pp, 'utm_')
       |              AND NOT starts_with(pp, 'fbclid=')
       |              AND NOT starts_with(pp, 'gclid='))), '&') AS sq
       |    FROM u3))""".stripMargin
}
