package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemap.xml `<loc>` extraction — the crawl-FRONTIER side of the
  * robots pair ([[Robots]] gates what may be crawled; sitemaps declare
  * what the origin wants crawled). A curation pipeline uses the
  * sitemap∖corpus difference as its recrawl frontier and the
  * corpus∖sitemap side as orphan-page signal.
  *
  * Extraction is the sitemaps.org protocol's data layer as string
  * algebra: `<loc>` elements in document order (whitespace-trimmed),
  * XML character references decoded ([[HtmlExtract.decodeEntities]] —
  * sitemap URLs escape `&` as `&amp;` per the protocol), then
  * [[UrlCanonical.canonicalize]] so frontier keys land in the same
  * space as every other URL in the engine. Map-only; index files
  * (`<sitemap><loc>`) surface through the same pattern since the
  * element name is identical. */
object Sitemaps {

  /** `<loc>` values, with an OPTIONAL `<![CDATA[…]]>` wrapper unwrapped
    * (ADVICE r16: real sitemaps CDATA-wrap loc values; the raw wrapper
    * text would otherwise flow into canonicalize and produce garbage
    * frontier keys). The wrapper pieces are independently optional, so
    * an unwrapped value containing a stray `]]>` keeps it (the lazy
    * group only yields it when `</loc>` follows immediately). */
  private val LocPat =
    "(?is)<loc>\\s*(?:<!\\[CDATA\\[)?\\s*(.*?)\\s*(?:\\]\\]>)?\\s*</loc>"

  /** One row per `<loc>` with its document-order index:
    * (…, loc_idx, loc_canon). */
  def locs(df: DataFrame, xmlCol: Column): DataFrame =
    df.select(col("*"),
        posexplode_outer(regexp_extract_all(xmlCol, lit(LocPat), lit(1)))
          .as(Seq("loc_idx", "__raw")))
      .filter(col("__raw").isNotNull)
      .withColumn("loc_canon",
        UrlCanonical.canonicalize(HtmlExtract.decodeEntities(col("__raw"))))
      .withColumn("loc_idx", col("loc_idx").cast("long"))
      .drop("__raw")

  /** DuckDB twin: the raw `<loc>` list over the SQL fragment `e`
    * (callers unnest + decode + canonicalize with the shared twins). */
  def duckLocs(e: String): String =
    s"""regexp_extract_all($e, '(?is)<loc>\\s*(?:<!\\[CDATA\\[)?\\s*(.*?)\\s*(?:\\]\\]>)?\\s*</loc>', 1)"""

  // ------------------------------------------------------------------
  // <url> entries with <lastmod> (VERDICT r16 next #4: the recrawl
  // scheduler — q159's actual consumer — wants staleness, not just
  // membership)
  // ------------------------------------------------------------------

  private val UrlPat = "(?is)<url>(.*?)</url>"
  private val LastmodPat = "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>"

  /** One row per `<url>` element with its document-order index, the
    * canonical loc, and the entry's `<lastmod>`: (…, url_idx,
    * loc_canon, lastmod_raw, lastmod_day). `lastmod_day` is the W3C
    * datetime's DATE component (sitemaps.org permits YYYY-MM-DD or
    * full ISO 8601 datetime — the date prefix is common to every
    * permitted form, and recrawl staleness is day-granular); a missing
    * or malformed lastmod parses to NULL, which a staleness order
    * should rank FIRST (unknown age = assume stale). Map-only. */
  def urlEntries(df: DataFrame, xmlCol: Column): DataFrame =
    df.select(col("*"),
        posexplode_outer(regexp_extract_all(xmlCol, lit(UrlPat), lit(1)))
          .as(Seq("url_idx", "__u")))
      .filter(col("__u").isNotNull)
      .withColumn("loc_canon",
        UrlCanonical.canonicalize(HtmlExtract.decodeEntities(
          regexp_extract(col("__u"), LocPat, 1))))
      .withColumn("lastmod_raw", regexp_extract(col("__u"), LastmodPat, 1))
      .withColumn("lastmod_day",
        expr("try_cast(substr(lastmod_raw, 1, 10) AS DATE)"))
      .withColumn("url_idx", col("url_idx").cast("long"))
      .drop("__u")

  /** DuckDB twins of the `<url>`-entry machinery: the raw entry list,
    * and the per-entry loc / lastmod / date-component extractions over
    * an entry fragment `u`. */
  def duckUrlEntries(e: String): String =
    s"""regexp_extract_all($e, '(?is)<url>(.*?)</url>', 1)"""
  def duckEntryLoc(u: String): String =
    s"""regexp_extract($u, '(?is)<loc>\\s*(?:<!\\[CDATA\\[)?\\s*(.*?)\\s*(?:\\]\\]>)?\\s*</loc>', 1)"""
  def duckEntryLastmod(u: String): String =
    s"""regexp_extract($u, '(?is)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)"""
  def duckLastmodDay(lm: String): String =
    s"""try_cast(substr($lm, 1, 10) AS DATE)"""
}
