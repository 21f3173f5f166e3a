package graft

import graft.olhovivo.SparkTestBase

/** The cache-hygiene contract: gate query entries release their
  * operator-internal persists once materialized — a full sweep leaves
  * nothing pinned in the session CacheManager (a long-lived user session
  * must not accumulate posting lists / signature relations). */
class CachingSpec extends SparkTestBase {

  /** All rdd-* checkpoint directories under a configured checkpoint dir
    * — the residue detector for the reliable-mode tests. */
  private def rddDirs(f: java.io.File): Seq[java.io.File] =
    Option(f.listFiles).toSeq.flatten.flatMap(c =>
      (if (c.getName.startsWith("rdd-")) Seq(c) else Nil) ++ rddDirs(c))

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

  test("reliable mode: CC releases superseded rounds; releaseAll cleans the rest") {
    import spark.implicits._
    SparkTestBase.sessionConfLock.synchronized {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cc").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      // two chains → a few large/small-star rounds, each checkpointed
      val verts = (1L to 8L).toDF("id")
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (7L, 8L))
        .toDF("a", "b")
      val comp = graft.dedup.ConnectedComponents
        .components(verts, "id", pairs, "a", "b")
      val byCluster = comp.collect().groupBy(_.getLong(1)).view.mapValues(
        _.map(_.getLong(0)).toSet).toMap
      assert(byCluster == Map(1L -> Set(1L, 2L, 3L, 4L), 5L -> Set(5L, 6L, 7L, 8L)))
      // superseded rounds were deleted as the loop ran: only the live
      // (final-round) checkpoints remain, not one per round
      val remaining = rddDirs(new java.io.File(dir))
      assert(remaining.nonEmpty, "reliable mode produced no checkpoint files")
      assert(remaining.size <= 2,
        s"per-round release failed: ${remaining.size} checkpoints on disk")
      // sweep-level cleanup: consumption is done → nothing stays behind
      Checkpoints.releaseAll(spark)
      assert(rddDirs(new java.io.File(dir)).isEmpty,
        "releaseAll left checkpoint files under the configured dir")
    } finally spark.conf.unset(Checkpoints.DirKey)
    }
  }

  test("reliable mode: a scoped dedup query leaves only its result checkpoint") {
    SparkTestBase.sessionConfLock.synchronized {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-scoped").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      // q59 checkpoints: q45's pairs result, CC's per-round edges, the
      // eager clusters relation, and the final result. Everything but
      // the result must be gone the moment the query function returns —
      // a library caller in reliable mode must not need the session-wide
      // releaseAll to avoid accumulating |data|-sized directories.
      val out = SparkEntry.queries("q59_dedup_survivors")(spark, "/root/testdata/sf0.001")
      assert(out.count() > 0)
      val residue = rddDirs(new java.io.File(dir))
      assert(residue.size == 1,
        s"expected ONLY the result checkpoint, found ${residue.size}: $residue")
      // per-query consumption signal (no releaseAll): frame itself
      Checkpoints.release(out)
      assert(rddDirs(new java.io.File(dir)).isEmpty,
        "result checkpoint survived its own release")
    } finally spark.conf.unset(Checkpoints.DirKey)
    }
  }

  test("releaseConsumed releases this scope's checkpoints and nobody else's") {
    import spark.implicits._
    SparkTestBase.sessionConfLock.synchronized {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-consumed").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val s1 = CacheScope.scoped()
      val s2 = CacheScope.scoped()
      val a = s1.materializeAndRelease(Seq(1, 2).toDF("x"))
      val b = s2.materializeAndRelease(Seq(3, 4, 5).toDF("x"))
      assert(a.count() == 2 && b.count() == 3)
      s1.releaseConsumed()
      val left = rddDirs(new java.io.File(dir))
      assert(left.size == 1, s"scope-1 release touched scope-2's files: $left")
      assert(b.count() == 3, "scope-2's frame must stay readable")
      s2.releaseConsumed()
      assert(rddDirs(new java.io.File(dir)).isEmpty)
    } finally spark.conf.unset(Checkpoints.DirKey)
    }
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
