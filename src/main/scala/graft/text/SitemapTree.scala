package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth sitemap TREE walk routed by ROOT ELEMENT (r18,
  * VERDICT r17 next #4/#5): the sitemaps.org protocol lets an index
  * name other indexes, and discovery (robots `Sitemap:` lines) hands a
  * crawler a mixed bag of plain sitemaps, indexes, and dead URLs — so
  * a real frontier build cannot route by URL shape. Each level:
  *
  *   1. FETCH the frontier's documents (caller-supplied — a join
  *      against zone captures, a gz member resolution, whatever the
  *      deployment's storage is; URLs the fetch cannot resolve drop);
  *   2. ROUTE by the document's root element: `<urlset>` is a LEAF
  *      (emitted with its discovery path and depth), `<sitemapindex>`
  *      recurses — its `<loc>` children become the next frontier with
  *      the parent's path extended by their document-order ordinal;
  *   3. DEDUPE the next frontier per (host, url): within a level the
  *      lexicographically smallest discovery path wins (ordinals are
  *      zero-padded to the protocol's 50k-entry width, so
  *      lexicographic = numeric), and ACROSS levels a cumulative
  *      visited set drops anything already attempted (ADVICE r18: the
  *      per-level aggregate alone re-fetched a sitemap reachable from
  *      parents at DIFFERENT depths — an acyclic diamond spanning
  *      levels emitted its urlset leaf twice, double-counting every
  *      loc downstream). So each (host, url) is settled exactly once:
  *      at its FIRST reachable depth, under the smallest discovery
  *      path of that depth — BFS discovery order, a cycle edge is
  *      simply never re-entered.
  *
  * Depth is BOUNDED (`maxDepth`) — the PageRank-style iterative sweep
  * with per-level lineage truncation ([[graft.Checkpoints.eager]]), so
  * the walk terminates at the bound even without the visited set and
  * no level re-runs the previous level's fetch lineage; the visited
  * relation (one narrow row per discovered sitemap URL) is
  * checkpointed per level too. The walk stops early when a frontier
  * empties (one cheap count job per level over a host-cardinality
  * relation).
  *
  * Scale shape: each level is one fetch-join + one map-only extraction
  * + one per-(host,url) aggregate — everything key-distributed, nothing
  * driver-side; 10⁸ discovered sitemaps walk level-parallel.
  */
object SitemapTree {

  /** Zero-pad width for path ordinals: the protocol caps an index at
    * 50,000 entries, so 5 digits keep lexicographic = numeric. */
  val OrdWidth = 5

  /** A seed/child ordinal as a path component. */
  def pathComponent(idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lpad(idx.cast("string"), OrdWidth, "0")

  /** Walk from `seeds (host, sm_canon, sm_path)`;
    * `fetch: (host, sm_canon, sm_path) → (host, sm_canon, sm_path, xml)`
    * resolves canonical URLs to document text (inner — unfetchable URLs
    * drop). Returns the LEAF urlset documents:
    * (host, sm_path, depth, xml). */
  def walk(seeds: DataFrame, fetch: DataFrame => DataFrame,
           maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    // seeds dedupe like any level (two Sitemap: lines naming one URL);
    // checkpointed because both depth-0 consumers (the visited seed and
    // the first fetch) would otherwise re-run the seed lineage — often
    // a discovery scan of its own
    var frontier = graft.Checkpoints.eager(
      seeds.select(col("host"), col("sm_canon"), col("sm_path"))
        .groupBy(col("host"), col("sm_canon"))
        .agg(min(col("sm_path")).as("sm_path")))
    // every (host, url) the walk has ATTEMPTED — fetched or dead; a
    // dead discovery is still settled and must not be re-tried at a
    // later depth under a longer path
    var visited = graft.Checkpoints.eager(
      frontier.select(col("host"), col("sm_canon")))
    var leaves: Option[DataFrame] = None
    var depth = 0
    var done = false
    while (!done && depth <= maxDepth) {
      val fetched = graft.Checkpoints.eager(
        fetch(frontier)
          .select(col("host"), col("sm_canon"), col("sm_path"), col("xml")))
      val routed = fetched.withColumn("__root",
        lower(regexp_extract(col("xml"), "(?is)<\\s*(urlset|sitemapindex)", 1)))
      val leaf = routed.filter(col("__root") === "urlset")
        .select(col("host"), col("sm_path"),
          lit(depth.toLong).as("depth"), col("xml"))
      leaves = Some(leaves.map(_.unionByName(leaf)).getOrElse(leaf))
      if (depth == maxDepth) done = true
      else {
        val refs = Sitemaps.locs(
            routed.filter(col("__root") === "sitemapindex")
              .select(col("host"), col("sm_path"), col("xml")),
            col("xml"))
          .select(col("host"), col("loc_canon").as("sm_canon"),
            concat(col("sm_path"), lit("/"),
              pathComponent(col("loc_idx"))).as("sm_path"))
        // checkpointed BEFORE the three consumers (emptiness probe,
        // visited union, next level's fetch) so the dedupe aggregate
        // and anti-join run once per level
        frontier = graft.Checkpoints.eager(
          refs.groupBy(col("host"), col("sm_canon"))
            .agg(min(col("sm_path")).as("sm_path"))
            .join(visited, Seq("host", "sm_canon"), "left_anti"))
        if (frontier.isEmpty) done = true
        else visited = graft.Checkpoints.eager(visited.unionByName(
          frontier.select(col("host"), col("sm_canon"))))
      }
      depth += 1
    }
    leaves.get
  }
}
