package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only harness (PairProbe's pattern, pointed at the two SCALE100
  * ratios that were explained but not measured — VERDICT r9 Next #3/#5):
  *
  *  - q110 PageRank: the TRUE input is the hub-capped distinct
  *    co-occurrence edge relation. Measure capped item rows, edges and
  *    nodes at 1× vs k× (Sharding.lineitem: k isolated components, the
  *    realistic growth law), so the published time ratio divides into a
  *    per-edge·sweep cost instead of standing unexplained.
  *  - q107/q121 span dedup: the TRUE input is the winnow fingerprint
  *    relation. Measure fingerprint rows, the distinct-hash vocabulary,
  *    shared hashes (df ≥ 2) and removal-interval rows at 1× vs k× in
  *    all three document growth modes (distinctchars = realistic for
  *    character-level operators, distinct = token-salted — distorts
  *    char-gram statistics, kept for cross-round comparability,
  *    neardup = adversarial all-shards-collide).
  *
  * Usage: runMain graft.GraphSpanProbe [k] [graph|span|both] (default 100 both)
  */
object GraphSpanProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(100)
    val what = args.lift(1).getOrElse("both")
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", math.max(32, 32 * k / 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    def ratio(a: Long, b: Long): String = f"x${b.toDouble / math.max(a, 1)}%.1f"

    if (what == "graph" || what == "both") {
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey"))
      def stats(kk: Int): (Long, Long, Long) = {
        val sh = (if (kk == 1) li else Sharding.lineitem(li, kk))
          .select(col("l_orderkey").as("k"), col("l_partkey")).distinct()
        val capped = graft.queries.GraphOps.cappedItems(sh)
        val e = capped.select(col("k"), col("l_partkey").as("src"))
          .join(capped.select(col("k"), col("l_partkey").as("dst")), Seq("k"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .persist()
        val edges = e.count()
        val nodes = e.select(col("src").as("n"))
          .union(e.select(col("dst").as("n"))).distinct().count()
        val rows = capped.count()
        e.unpersist()
        (rows, edges, nodes)
      }
      val (r1, e1, n1) = stats(1)
      val (rk, ek, nk) = stats(k)
      println(s"GRAPHPROBE capped_items 1x=$r1 ${k}x=$rk (${ratio(r1, rk)})")
      println(s"GRAPHPROBE edges        1x=$e1 ${k}x=$ek (${ratio(e1, ek)})")
      println(s"GRAPHPROBE nodes        1x=$n1 ${k}x=$nk (${ratio(n1, nk)})")
    }

    if (what == "span" || what == "both") {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      for (mode <- Seq("distinctchars", "distinct", "neardup")) {
        val shard: (DataFrame, Int) => DataFrame = mode match {
          case "distinctchars" => Sharding.documentsDistinctChars
          case "distinct"      => Sharding.documentsDistinct
          case _               => Sharding.documents
        }
        def stats(kk: Int): (Long, Long, Long, Long) = {
          val d = if (kk == 1) docs else shard(docs, kk)
          val fp = graft.text.SpanDedup
            .fingerprints(d, "doc_id", col("text")).distinct().persist()
          val fpRows = fp.count()
          val perDoc = fp.select(col("doc_id"), col("h")).distinct()
          val own = perDoc.groupBy(col("h"))
            .agg(min(col("doc_id")).as("__keeper"), count(lit(1)).as("__df"))
            .persist()
          val vocab = own.count()
          val shared = own.filter(col("__df") >= 2).count()
          val rm = fp.join(own.filter(col("__df") >= 2), Seq("h"))
            .filter(col("doc_id") =!= col("__keeper"))
            .select(col("doc_id"), col("p")).distinct().count()
          fp.unpersist(); own.unpersist()
          (fpRows, vocab, shared, rm)
        }
        val (f1, v1, s1, m1) = stats(1)
        val (fk, vk, sk, mk) = stats(k)
        println(s"SPANPROBE mode=$mode fp_rows   1x=$f1 ${k}x=$fk (${ratio(f1, fk)})")
        println(s"SPANPROBE mode=$mode hash_voc  1x=$v1 ${k}x=$vk (${ratio(v1, vk)})")
        println(s"SPANPROBE mode=$mode shared_h  1x=$s1 ${k}x=$sk (${ratio(s1, sk)})")
        println(s"SPANPROBE mode=$mode rm_rows   1x=$m1 ${k}x=$mk (${ratio(m1, mk)})")
      }
    }
    spark.stop()
  }
}
