package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** The bounded-depth root-element-routed sitemap walk (r18). */
class SitemapTreeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(pairs: (String, String)*): DataFrame =
    pairs.toSeq.toDF("sm_canon", "xml")

  private def fetchFrom(store: DataFrame)(frontier: DataFrame): DataFrame =
    frontier.join(store, Seq("sm_canon"))

  private def seeds(urls: String*): DataFrame =
    urls.zipWithIndex.toSeq.toDF("sm_canon", "i")
      .select(lit("h.example").as("host"), col("sm_canon"),
        SitemapTree.pathComponent(col("i")).as("sm_path"))

  test("routes by root element, not URL shape; dead URLs drop; paths carry document order across levels") {
    val store = docs(
      // an INDEX whose URL doesn't say so, listing a child index + a leaf
      "http://h.example/a" ->
        ("<?xml version=\"1.0\"?><sitemapindex>" +
          "<sitemap><loc>http://h.example/b</loc></sitemap>" +
          "<sitemap><loc>http://h.example/leaf1.xml</loc></sitemap>" +
          "</sitemapindex>"),
      // the child index, nesting one more level
      "http://h.example/b" ->
        "<sitemapindex><sitemap><loc>http://h.example/leaf2</loc></sitemap></sitemapindex>",
      "http://h.example/leaf1.xml" ->
        "<urlset><url><loc>http://h.example/p1</loc></url></urlset>",
      "http://h.example/leaf2" ->
        "<urlset><url><loc>http://h.example/p2</loc></url></urlset>",
      // a directly-seeded LEAF
      "http://h.example/direct" ->
        "<urlset><url><loc>http://h.example/p3</loc></url></urlset>")
    val out = SitemapTree.walk(
        seeds("http://h.example/a", "http://h.example/dead",
          "http://h.example/direct"),
        fetchFrom(store), maxDepth = 3)
      .select(col("sm_path"), col("depth")).as[(String, Long)]
      .collect().toSet
    assert(out == Set(
      ("00002", 0L),             // direct leaf, seed ordinal 2
      ("00000/00001", 1L),       // leaf1 under a's second child slot
      ("00000/00000/00000", 2L)  // leaf2 under a/b
    ), s"got $out")
  }

  test("a sitemap reachable through two parents is fetched once, smallest discovery path wins") {
    val store = docs(
      "http://h.example/i1" ->
        "<sitemapindex><sitemap><loc>http://h.example/shared</loc></sitemap></sitemapindex>",
      "http://h.example/i2" ->
        "<sitemapindex><sitemap><loc>http://h.example/shared</loc></sitemap></sitemapindex>",
      "http://h.example/shared" ->
        "<urlset><url><loc>http://h.example/p</loc></url></urlset>")
    val out = SitemapTree.walk(
        seeds("http://h.example/i1", "http://h.example/i2"),
        fetchFrom(store), maxDepth = 2)
      .select(col("sm_path")).as[String].collect().toSeq
    assert(out == Seq("00000/00000"), s"one leaf via the smaller parent: $out")
  }

  test("a cyclic index graph terminates immediately: the visited set never re-enters the cycle edge (ADVICE r18)") {
    val store = docs(
      "http://h.example/cyc" ->
        ("<sitemapindex><sitemap><loc>http://h.example/cyc</loc></sitemap>" +
          "<sitemap><loc>http://h.example/l</loc></sitemap></sitemapindex>"),
      "http://h.example/l" ->
        "<urlset><url><loc>http://h.example/p</loc></url></urlset>")
    val out = SitemapTree.walk(seeds("http://h.example/cyc"),
        fetchFrom(store), maxDepth = 2)
      .select(col("sm_path"), col("depth")).as[(String, Long)]
      .collect().toSet
    // pre-r19 the leaf was re-discovered under the cycle at every depth
    // (00000/00000/00001 at depth 2, …); the cumulative visited set
    // settles each URL once — the leaf emits exactly once, at its first
    // reachable depth
    assert(out == Set(("00000/00001", 1L)), s"got $out")
  }

  test("an acyclic diamond SPANNING levels fetches the shared sitemap once, at its first reachable depth (ADVICE r18)") {
    // seed0 is an index two levels deep to /shared; seed1 reaches
    // /shared directly at depth 1: pre-r19 the per-level dedupe missed
    // the cross-level re-discovery and the urlset leaf emitted twice
    // (double-counting every loc downstream)
    val store = docs(
      "http://h.example/deep" ->
        "<sitemapindex><sitemap><loc>http://h.example/mid</loc></sitemap></sitemapindex>",
      "http://h.example/mid" ->
        "<sitemapindex><sitemap><loc>http://h.example/shared</loc></sitemap></sitemapindex>",
      "http://h.example/flat" ->
        "<sitemapindex><sitemap><loc>http://h.example/shared</loc></sitemap></sitemapindex>",
      "http://h.example/shared" ->
        "<urlset><url><loc>http://h.example/p</loc></url></urlset>")
    val out = SitemapTree.walk(
        seeds("http://h.example/deep", "http://h.example/flat"),
        fetchFrom(store), maxDepth = 3)
      .select(col("sm_path"), col("depth")).as[(String, Long)]
      .collect().toSeq
    assert(out == Seq(("00001/00000", 1L)),
      s"one leaf, first reachable depth, via the flat parent: $out")
  }

  test("a DEAD discovery is settled too: re-discovering it deeper does not re-try the fetch") {
    // /ghost resolves nowhere at depth 1 (seed) and is named again by
    // the index at depth 1 — the walk must not carry it into depth 2's
    // frontier (the fetch join would just drop it again, but the
    // visited contract is 'attempted once', fetched or not)
    val store = docs(
      "http://h.example/idx" ->
        ("<sitemapindex><sitemap><loc>http://h.example/ghost</loc></sitemap>" +
          "<sitemap><loc>http://h.example/leafy</loc></sitemap></sitemapindex>"),
      "http://h.example/leafy" ->
        "<urlset><url><loc>http://h.example/p</loc></url></urlset>")
    val out = SitemapTree.walk(
        seeds("http://h.example/ghost", "http://h.example/idx"),
        fetchFrom(store), maxDepth = 2)
      .select(col("sm_path"), col("depth")).as[(String, Long)]
      .collect().toSet
    assert(out == Set(("00001/00001", 1L)), s"got $out")
  }
}
