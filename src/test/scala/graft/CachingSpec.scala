package graft

import graft.olhovivo.SparkTestBase

/** The cache-hygiene contract: gate query entries release their
  * operator-internal persists once materialized — a full sweep leaves
  * nothing pinned in the session CacheManager (a long-lived user session
  * must not accumulate posting lists / signature relations). */
class CachingSpec extends SparkTestBase {

  test("caching queries leave the CacheManager empty after materialization") {
    val dir = "/root/testdata/sf0.001"
    // the five entries whose operators cache internally
    val caching = Seq("q42_lsh_candidates", "q43_jaccard_join",
      "q45_simhash_pairs", "q47_dedup_clusters", "q51_lsh_neardup")
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    caching.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n >= 0)
      assert(cm.isEmpty, s"$name left pinned blocks in the CacheManager")
    }
  }

  test("scoped materializeAndRelease returns a reusable frame") {
    import spark.implicits._
    val scope = CacheScope.scoped()
    val cached = scope.cache(Seq(1, 2, 3).toDF("x"))
    val out = scope.materializeAndRelease(cached.selectExpr("x * 2 AS y"))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6))
    // second action works off the checkpoint (cache already released)
    assert(out.count() == 3)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("intermediates are released even when materialization fails") {
    import spark.implicits._
    val scope = CacheScope.scoped()
    val cached = scope.cache(Seq(1, 2, 3).toDF("x"))
    intercept[Exception] {
      scope.materializeAndRelease(
        cached.selectExpr("assert_true(x > 10) AS y", "x"))
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "a failed query left session-lifetime persists behind")
  }

  test("checkpoint dir conf switches materialization to reliable checkpoints") {
    import spark.implicits._
    SparkTestBase.sessionConfLock.synchronized {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val scope = CacheScope.scoped()
      val out = scope.materializeAndRelease(
        scope.cache(Seq(1, 2, 3).toDF("x")).selectExpr("x * 2 AS y"))
      assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6))
      // the reliable checkpoint actually landed on disk
      def rddFiles(f: java.io.File): Int =
        Option(f.listFiles).map(_.map(c =>
          (if (c.getName.startsWith("rdd-")) 1 else 0) + rddFiles(c)).sum).getOrElse(0)
      assert(rddFiles(new java.io.File(dir)) > 0, s"no rdd-* dirs under $dir")
    } finally spark.conf.unset(Checkpoints.DirKey)
    }
  }
}
