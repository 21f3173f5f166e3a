package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only harness (like Scratch — NOT part of the driver contract):
  * measure how the heavyweight paths scale BEYOND the driver's largest
  * test SF by synthesizing an N× corpus from sf0.1 (id-offset shards
  * with content perturbation so cross-shard rows are near- but not
  * exact duplicates) and running the full dedup chain and ANN search
  * on it. Prints per-stage wall times for 1× vs N× — the evidence for
  * "linear in corpus size", not just the argument.
  *
  * Usage: runMain graft.ScaleProbe [N]   (default 10)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    // graft.Sharding: the one scaffold all scale harnesses share
    def shardedDocs(k: Int): DataFrame =
      Sharding.documents(Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")), k)

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SCALE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    def shardedEmb(k: Int): DataFrame =
      Sharding.embeddings(Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"), col("label")), k)

    for (k <- Seq(1, n)) {
      println(s"=== corpus ${k}x")
      // the partition-sizing rule, applied: shuffle partitions scale
      // with the data so each aggregation/join partition stays
      // memory-sized (at 100x the sf0.1 setting of 32 partitions, CC's
      // pair aggregation OOMs in a single local JVM — measured; with
      // corpus-scaled partitions the same job completes)
      val parts = math.max(32, 32 * k / 10)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      println(s"shuffle partitions: $parts")
      val docs = shardedDocs(k).persist()
      println(s"docs: ${docs.count()}")
      val pairs = time(s"${k}x lsh candidate pairs") {
        import graft.dedup.Dedup
        val sig = Dedup.withMinhashSignature(
          docs.filter(size(graft.text.TextAnalysis.tokens(col("text"))) >= 3),
          col("text"), 8, 3, "sig").select(col("doc_id"), col("sig"))
        val bands = sig.select(col("doc_id"),
          posexplode_outer(Dedup.lshBands(col("sig"), 8, 2)).as(Seq("band", "bh")))
          .persist()
        val p = bands.toDF("id_a", "band", "bh")
          .join(bands.toDF("id_b", "band", "bh"), Seq("band", "bh"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
          .persist()
        p.count(); bands.unpersist(); p
      }
      time(s"${k}x connected components") {
        graft.dedup.ConnectedComponents
          .components(docs, "doc_id", pairs, "id_a", "id_b").count()
      }
      time(s"${k}x jaccard join") {
        graft.dedup.Dedup.jaccardJoin(docs, "doc_id", col("text")).count()
      }
      time(s"${k}x minhash signatures") {
        graft.dedup.Dedup.withMinhashSignature(docs, col("text"), 8, 3, "sig")
          .agg(count(lit(1))).head()
      }
      // span dedup: sharded docs differ only in the appended marker, so
      // every base doc's k copies pair up — pair counts (and the join's
      // output work) grow ~k² by construction, like CC's edges; the
      // winnow+distinct fingerprint side must stay linear. df-cap note:
      // a hash with base df > 64/k falls to the cap at k shards — the
      // boilerplate guard doing exactly its job at scale.
      time(s"${k}x winnow span pairs") {
        graft.text.SpanDedup.sharedSpanPairs(docs, "doc_id", col("text")).count()
      }
      pairs.unpersist(); docs.unpersist()
      spark.catalog.clearCache()
      Checkpoints.releaseAll(spark)

      // ANN: the IVF claim is that SEARCH cost tracks probed-list
      // volume (nProbe/k of the corpus), not corpus size — fit and
      // index amortize, so time them separately from the query path
      val emb = shardedEmb(k).persist()
      println(s"embeddings: ${emb.count()}")
      val model = time(s"${k}x ivf fit (sampled 1-in-8)") {
        graft.similarity.Ivf.fit(emb, k = 32, iters = 2, fitOneIn = 8)
      }
      val indexed = time(s"${k}x ivf index") {
        val ix = graft.similarity.Ivf.index(Tables.spread(spark, emb), model)
          .persist()
        ix.count(); ix
      }
      val queries = emb.filter(col("vec_id") < 20)
      time(s"${k}x ivf search (probe 4/32)") {
        graft.similarity.Ivf.search(queries, indexed, model,
          topK = 10, nProbe = 4).count()
      }
      // semantic dedup: centroid count scales WITH the corpus (the
      // bounded-mean-cluster-size rule) so the per-cluster pair step
      // stays bounded; shard copies are +1e-4 perturbations → cosine≈1
      // → they drop, so the probe exercises real drop volume
      time(s"${k}x semantic dedup (k=${8 * k})") {
        val cents = graft.similarity.Clustering
          .seedCentroids(emb, "vec_id", "embedding", 8 * k)
        graft.similarity.SemDedup
          .semanticDedup(emb, "vec_id", "embedding", cents, 0.9)
          .filter(!col("kept")).count()
      }
      indexed.unpersist(); emb.unpersist()
      spark.catalog.clearCache()

      // z-order clustered write, mixed string+numeric dims: the claim
      // is the boundary FIT is corpus-flat (one sketch aggregate + one
      // bounded sample — the model, not the data) and the WRITE is the
      // one range shuffle any clustering pays, linear in rows
      val zdocs = shardedDocs(k)
      val zdir = java.nio.file.Files.createTempDirectory("graft-zprobe").toString
      val zb = time(s"${k}x z-order boundary fit") {
        graft.sources.ZOrder.fitBounds(zdocs, Seq("source", "n_chars"))
      }
      println(s"  bounds: ${zb.map(_.size).mkString("/")}")
      time(s"${k}x z-order clustered write") {
        // reuse the bounds fitted (and timed) above: the write timing
        // must measure the one range shuffle, not a second boundary fit
        graft.sources.ZOrder.writeZOrdered(zdocs, s"$zdir/z",
          Seq("source", "n_chars"), numFiles = math.max(16, 16 * k / 10),
          bounds = Some(zb))
      }
      TempArtifacts.deleteRecursively(new java.io.File(zdir))

      // PageRank: edges grow ~linearly under sharding (each shard is an
      // isolated copy of the co-occurrence graph — k independent
      // components), so the claim measured here is per-sweep cost
      // linear in |edges| with the constant-per-round checkpoint
      // hygiene CC proved out. Edge build = the q110 shape over k-shard
      // lineitem ids.
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("k0"), col("l_partkey")).distinct()
      val liTotal = li.agg(max(col("l_partkey"))).collect()(0).getLong(0) + 1
      val liSharded = (0 until k).map { s =>
        li.select((col("k0") + lit(s.toLong * 10000000L)).as("k0"),
          (col("l_partkey") + lit(s * liTotal)).as("l_partkey"))
      }.reduce(_ unionByName _)
      val prEdges = time(s"${k}x pagerank edge build") {
        val a = liSharded.select(col("k0"), col("l_partkey").as("src"))
        val b = liSharded.select(col("k0"), col("l_partkey").as("dst"))
        val e = a.join(b, Seq("k0")).filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct().persist()
        println(s"  edges: ${e.count()}")
        e
      }
      time(s"${k}x pagerank 3 sweeps") {
        graft.operators.PageRank.run(prEdges, "src", "dst", 3).count()
      }
      prEdges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
