package graft

import org.apache.spark.sql.functions._

/** Dev-only harness (VERDICT r9 Next #4): hash-gate the corpus-adaptive
  * parameters ABOVE their floors. Every driver gate dir sits below the
  * legacy floors (bits=24, planes=8, semK=8, ivfK=8), so until this
  * harness no DuckDB oracle had ever hashed a result computed at an
  * adaptive width — AdaptiveParamsSpec pins the growth laws and
  * semantics, but not cross-engine value equality.
  *
  * Synthesizes an above-floor corpus from sf0.1 — sized for
  * RE-RUNNABILITY (r10's 20k-doc/16k-vector corpus put the DuckDB side
  * at ~2.2 h, which meant the artifact would silently never run again;
  * r10 VERDICT Next #7): documents ×2 → 10 000 docs ⇒ simhashBitsFor
  * = 27 > 24; embeddings ×5 → 10 240 vectors ⇒ planesFor = 9 > 8,
  * adaptiveK = 40 > 8, Ivf.kFor = 13 > 8 — every parameter still
  * strictly above its floor, with the oracle's quadratic pair scans
  * and recursive CC walk at ~¼ the r10 cost. Runs the adaptive-
  * parameter gate entries (incl. the q129 distributed Lloyd fit at the
  * adaptive k) through the UNMODIFIED SparkEntry.queries path (the
  * queries recompute the same adaptive values from the dir), and dumps
  * oracle SQL built with the SAME computed constants
  * (DedupOps.q45SqlFor/q47SqlFor/q59SqlFor, VectorOps.q51SqlFor/
  * q106SqlFor/q129SqlFor; q52's full-probe oracle is k-independent
  * brute force by construction). Run via tools/adaptivegate.sh, or:
  *
  *   runMain graft.AdaptiveGate /tmp/graft_adaptive
  *   python3 tools/selfcheck.py /tmp/graft_adaptive-data /tmp/graft_adaptive
  */
object AdaptiveGate {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_adaptive")
    val docsShards = args.lift(1).map(_.toInt).getOrElse(2)
    val embShards = args.lift(2).map(_.toInt).getOrElse(5)
    val sf = "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val dir = s"$out-data" // sibling, NOT inside out: selfcheck treats every out subdir as a query dump

    // Resume-check BOTH outputs: a prior run that died between the two
    // writes would otherwise skip synthesis and leave a missing/stale
    // embeddings table behind a confusing require() failure.
    if (!new java.io.File(s"$dir/documents.parquet").exists() ||
        !new java.io.File(s"$dir/embeddings.parquet").exists()) {
      Sharding.documentsDistinctChars(
          spark.read.parquet(s"$sf/documents.parquet"), docsShards)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Sharding.embeddings(
          spark.read.parquet(s"$sf/embeddings.parquet"), embShards)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    val nDocs = Tables.documents(spark, dir).count()
    val nEmb = Tables.embeddings(spark, dir).count()
    val bits = dedup.Dedup.simhashBitsFor(nDocs)
    val planes = similarity.Similarity.planesFor(nEmb)
    val semK = similarity.Clustering.adaptiveK(nEmb)
    val ivfK = similarity.Ivf.kFor(nEmb)
    println(s"ADAPTIVEGATE nDocs=$nDocs nEmb=$nEmb " +
      s"bits=$bits planes=$planes semK=$semK ivfK=$ivfK")
    require(bits > 24 && planes > 8 && semK > 8 && ivfK > 8,
      "synthesized corpus must sit ABOVE every legacy floor")

    val names = Seq("q45_simhash_pairs", "q47_dedup_clusters",
      "q59_dedup_survivors", "q130_leakage_safe_split", "q51_lsh_neardup",
      "q106_semantic_dedup", "q52_ivf_topk", "q129_kmeans_fit")
    new java.io.File(out).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$name")
      println(f"ADAPTIVEGATE ran $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
      spark.catalog.clearCache()
      Checkpoints.releaseAll(spark)
    }

    val oracle = Map(
      "q45_simhash_pairs"   -> queries.DedupOps.q45SqlFor(bits),
      "q47_dedup_clusters"  -> queries.DedupOps.q47SqlFor(bits),
      "q59_dedup_survivors" -> queries.DedupOps.q59SqlFor(bits),
      "q130_leakage_safe_split" -> queries.DedupOps.q130SqlFor(bits),
      "q51_lsh_neardup"     -> queries.VectorOps.q51SqlFor(planes),
      "q106_semantic_dedup" -> queries.VectorOps.q106SqlFor(semK),
      "q52_ivf_topk"        -> queries.VectorOps.oracles("q52_ivf_topk"),
      "q129_kmeans_fit"     -> queries.VectorOps.q129SqlFor(semK, 3),
    )
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
