package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only harness (like ScaleProbe — NOT part of the driver
  * contract): measure what the per-member `.warc.gz` index buys INSIDE
  * one file. Synthesizes ONE `.warc.gz` of N records in the Common
  * Crawl layout (one gzip member per record, concatenated), then times
  *
  *   whole  — Warc.readExact: the file is one gzip stream to Hadoop,
  *            so ONE task decodes everything;
  *   index  — WarcGz.memberIndex: the sequential boundary walk
  *            (amortized once per zone lifetime, cdx-style);
  *   split  — WarcGz.readMembers: every core decodes its own members.
  *
  * The deployed comparison is `whole` vs `split` (a landing pipeline
  * builds the index at write time); `index+split` is the worst case
  * where the index is built on first read.
  *
  * Usage: runMain graft.WarcGzProbe [nDocs] (default 120000)
  */
object WarcGzProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(120000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = TempArtifacts.dir("graft_warcgz_probe")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat(lit("synthetic web document body "),
        col("id").cast("string"),
        lit(" — " + ("lorem ipsum dolor sit amet " * 20))).as("text"))
    graft.sources.Warc.synthesize(spark, docs, dir, nFiles = 1, gzip = true)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileBytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getLen).sum

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm the JIT + page cache once with a small slice of each path
    graft.sources.Warc.readExact(spark, dir).limit(1).count()

    val (tWhole, nWhole) = time {
      graft.sources.Warc.readExact(spark, dir)
        .filter(col("is_valid")).count()
    }
    val (tIndex, nMembers) = time {
      val idx = Idx.cache(spark, dir); idx.count()
    }
    val (tSplit, nSplit) = time {
      graft.sources.WarcGz.readMembers(spark, Idx.cache(spark, dir))
        .filter(col("is_valid")).count()
    }
    require(nWhole == nSplit, s"row mismatch: whole=$nWhole split=$nSplit")
    println(
      s"""{"probe":"warcgz_split","n_docs":$nDocs,"file_mb":${fileBytes >> 20},""" +
        s""""members":$nMembers,"valid":$nWhole,""" +
        f""""whole_sec":$tWhole%.2f,"index_sec":$tIndex%.2f,"split_sec":$tSplit%.2f,""" +
        f""""speedup_split":${tWhole / tSplit}%.2f,""" +
        f""""speedup_incl_index":${tWhole / (tIndex + tSplit)}%.2f}""")
    spark.stop()
  }

  /** index once per probe run (the zone-lifetime reuse shape). */
  private object Idx {
    private var cached: org.apache.spark.sql.DataFrame = _
    def cache(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
      if (cached == null)
        cached = graft.sources.WarcGz.memberIndex(spark, dir).cache()
      cached
    }
  }
}
