package graft

import org.apache.spark.sql.functions._

/** Dev-only harness: measure the LSH candidate-pair count (the CC
  * chain's true input) for the k×-sharded synthetic corpus ScaleBench
  * times q47/q59 on. The sharding appends a per-shard marker to each
  * document, so a base document's k copies are near- not byte-dups and
  * MOSTLY pair up — pair counts grow ~k² while rows grow k. This probe
  * turns SCALE30_r08.json's "super-linear in input, not in work" claim
  * from argued to measured: divide the CC chain's time ratio by the
  * pair ratio to see the per-edge cost.
  *
  * With mode `distinct` (Sharding.documentsDistinct) the probe instead
  * measures the REALISTIC growth law — shard-salted tokens, constant
  * duplication rate — where pairs should grow ~k, not ~k².
  *
  * Usage: runMain graft.PairProbe [k] [neardup|distinct]   (default 30 neardup)
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(30)
    val mode = args.lift(1).getOrElse("neardup")
    val shardDocs: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame =
      if (mode == "distinct") Sharding.documentsDistinct else Sharding.documents
    val sf = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", math.max(32, 32 * k / 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    def lshPairs(kk: Int): Long = {
      val c = graft.queries.DedupOps.lshCandidatePairCount(
        spark, shardDocs(docs, kk))
      spark.catalog.clearCache()
      c
    }
    def simStats(kk: Int): (Int, Long, Long) = {
      val st = graft.queries.DedupOps.simhashPairStats(spark, shardDocs(docs, kk))
      spark.catalog.clearCache()
      Checkpoints.releaseAll(spark)
      st
    }
    val p1 = lshPairs(1)
    val pk = lshPairs(k)
    val (b1, c1, e1) = simStats(1)
    val (bk, ck, ek) = simStats(k)
    println(f"PAIRPROBE mode=$mode%s rows 1x=$n%d ${k}x=${n * k}%d (x$k)")
    println(f"PAIRPROBE mode=$mode%s lsh_pairs 1x=$p1%d ${k}x=$pk%d (x${pk.toDouble / math.max(p1, 1)}%.1f)")
    println(f"PAIRPROBE mode=$mode%s simhash 1x bits=$b1%d candidates=$c1%d edges=$e1%d")
    println(f"PAIRPROBE mode=$mode%s simhash ${k}x bits=$bk%d candidates=$ck%d edges=$ek%d " +
      f"(cand x${ck.toDouble / math.max(c1, 1)}%.1f, edges x${ek.toDouble / math.max(e1, 1)}%.1f)")
    spark.stop()
  }
}
