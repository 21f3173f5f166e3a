package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{HtmlExtract, UrlCanonical}

/** Dev-only probe (NOT part of the driver contract): time the q150
  * outlink chain LAYER BY LAYER over the html zone, so per-row
  * expression cost attributes to a specific stage of the string
  * algebra (zone parse → messy URL → base → href explode → entity
  * decode → resolve → canonicalize).
  *
  * Usage: runMain graft.queries.ChainProbe /root/testdata/sf0.1
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    val zone = CorpusOps.htmlZoneFor(spark, dir)

    def pages: DataFrame = graft.sources.Warc.readExactClean(spark, zone)
      .select(
        regexp_extract(col("url"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload"))

    // parse-cost breakdown over the raw chunk relation
    val chunks = spark.read.option("lineSep", graft.sources.Warc.Magic)
      .text(zone).filter(length(col("value")) > 0)
    val hdrs = substring_index(col("value"), "\r\n\r\n", 1)
    def names(l: org.apache.spark.sql.Column) =
      transform(split(l, "\r\n"), x => lower(substring_index(x, ":", 1)))
    val layers: Seq[(String, () => DataFrame)] = Seq(
      "0a raw chunks" -> (() => chunks),
      "0b +headers" -> (() => chunks.select(hdrs.as("h"))),
      "0c +dup check" -> (() => chunks.select(hdrs.as("h"))
        .select((size(names(col("h"))) ===
          size(array_distinct(names(col("h"))))).as("nodup"))),
      "0d +map(firstwins)" -> (() => {
        // private firstWinsHeaders replica (the hot-path shape)
        val lines = split(col("h"), "\r\n")
        def nm(l: org.apache.spark.sql.Column) = lower(substring_index(l, ":", 1))
        val nms = transform(lines, nm(_))
        val fw = when(size(nms) === size(array_distinct(nms)), col("h"))
          .otherwise(array_join(
            filter(lines, (l, i) =>
              size(filter(slice(lines, lit(1), i), p => nm(p) === nm(l))) === 0),
            "\r\n"))
        chunks.select(hdrs.as("h"))
          .select(str_to_map(fw, lit("\r\n"), lit(": ")).as("m"))
      }),
      "0e +rest substr" -> (() => chunks.select(expr(
        raw"substr(value, length(substring_index(value, '\r\n\r\n', 1)) + 5)")
        .as("rest"))),
      "0f parseChunks" -> (() => graft.sources.Warc.parseChunks(chunks)),
      "0g +cl regex" -> (() => chunks.select(regexp_extract_all(hdrs,
        lit("(?mi)^content-length:[ \\t]*([0-9]+)[ \\t]*\r?$"), lit(1)).as("cls"))),
      "1 zone read" -> (() => pages),
      "2 +messyUrl" -> (() => pages.select(col("doc_id"), col("payload"),
        CorpusOps.messyUrlCol.as("__url"))),
      "3 +baseHref raw" -> (() => pages.select(col("doc_id"),
        HtmlExtract.baseHref(col("payload")).as("bh"))),
      "4 +decode(baseHref)" -> (() => pages.select(col("doc_id"),
        HtmlExtract.decodeEntities(HtmlExtract.baseHref(col("payload"))).as("bhd"))),
      "5 +hrefs explode" -> (() => pages.select(col("doc_id"),
        posexplode_outer(HtmlExtract.hrefs(col("payload"))).as(Seq("i", "h")))),
      "6 +decode(href)" -> (() => pages.select(col("doc_id"),
        posexplode_outer(HtmlExtract.hrefs(col("payload"))).as(Seq("i", "h")))
        .select(col("doc_id"), col("i"),
          HtmlExtract.decodeEntities(col("h")).as("hd"))),
      "7 +canon(url) only" -> (() => pages.select(col("doc_id"),
        CorpusOps.messyUrlCol.as("__url"))
        .select(col("doc_id"), UrlCanonical.canonicalize(col("__url")).as("c"))),
      "8 +resolve(url,href)" -> (() => pages.select(col("doc_id"),
        CorpusOps.messyUrlCol.as("__url"), col("payload"))
        .select(col("doc_id"), col("__url"),
          posexplode_outer(HtmlExtract.hrefs(col("payload"))).as(Seq("i", "h")))
        .select(col("doc_id"),
          UrlCanonical.resolve(col("__url"),
            HtmlExtract.decodeEntities(col("h"))).as("r"))),
      "9 full q150" -> (() => graft.SparkEntry.queries("q150_outlinks")(spark, dir)),
    )
    for ((name, mk) <- layers) {
      // warm once, then min of 2 timed
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"$name%-22s ${t}%6.2f s")
    }
    spark.stop()
  }
}
