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

    val layers: Seq[(String, () => DataFrame)] = Seq(
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
