package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.PageRank
import graft.text.{HtmlExtract, UrlCanonical}

/** The crawl-graph chain (VERDICT r15 next #1/#2): outlink extraction
  * from WARC HTML payloads, RFC 3986 §5 relative-reference resolution
  * against each page's URL, canonicalization of both endpoints — and
  * the host-level PageRank over the REAL link graph those edges form
  * (domain authority as a curation signal, replacing q110's
  * co-occurrence-edge stand-in).
  *
  * Scale shape: q150 is MAP-ONLY after the zone read — href extraction,
  * entity decode, resolution and canonicalization are all composed
  * string algebra per row; 100 TB of pages emit edges at scan speed
  * with zero exchanges. q151 adds exactly the exchanges a link-graph
  * rank needs: one distinct on the host-edge relation (host-cardinality
  * rows, tiny next to the page scan) and PageRank's per-sweep
  * aggregation over its once-laid-out edge relation.
  */
object WebGraphOps {

  type Q = (SparkSession, String) => DataFrame

  /** Non-hierarchical references (`mailto:`, `javascript:`, `data:` —
    * a scheme with no '://') are screened out BEFORE resolution: they
    * are not crawl edges, and §5.2's merge would otherwise treat them
    * as relative paths. Mirrored verbatim in the oracle. */
  private val SchemeLike = "^[A-Za-z][A-Za-z0-9+.\\-]*:"
  private val Hierarchical = "^[A-Za-z][A-Za-z0-9+.\\-]*://"

  /** The outlink-edge relation over the per-dir HTML WARC zone:
    * (doc_id, link_idx, href, src_canon, dst_canon). `link_idx` is the
    * href's position among ALL extracted targets (pre-screen, so
    * indices are stable); `href` is the entity-DECODED attribute value
    * (what a browser resolves); both endpoints are canonical. */
  /** The WARC HTML pages with their RESOLUTION BASE attached — RFC 3986
    * §5.1's precedence (VERDICT r17 weak #1): an embedded `<base href>`
    * comes FIRST, the retrieval URI is the fallback. The base href is
    * itself a reference (§5.1: a RELATIVE base resolves against the
    * retrieval URI), entity-decoded like any attribute; an empty or
    * non-hierarchical (`mailto:`) base is ignored. The page's own URL
    * is the q139/q144 messy fixture (deterministic from doc_id):
    * resolution runs against the RAW spelling — variant case, IDN
    * hosts, ports, dot-segment-bearing directories — and
    * canonicalization collapses the results, exactly the real-crawl
    * order of operations. `__url` stays the retrieval URI (the SOURCE
    * endpoint — a base changes where links point, not where the page
    * lives); `__base` is the effective resolution base. */
  private def pagesWithBase(s: SparkSession, dir: String): DataFrame = {
    val zone = CorpusOps.htmlZoneFor(s, dir)
    graft.sources.Warc.readExactClean(s, zone)
      .select(
        regexp_extract(col("url"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload"))
      .select(col("doc_id"), col("payload"),
        CorpusOps.messyUrlCol.as("__url"))
      .withColumn("__base",
        effectiveBase(col("__url"),
          HtmlExtract.baseHref(col("payload"))))
  }

  /** `coalesce`-style §5.1.1 base selection, LET-BOUND so the decoded
    * base-href subtree is built once, not once per predicate (Column
    * vals substitute textually — the UrlCanonical.let discipline). */
  private def effectiveBase(url: Column, rawBase: Column): Column =
    UrlCanonical.let(HtmlExtract.decodeEntities(rawBase)) { bh =>
      UrlCanonical.let(url) { u =>
        when(bh.isNull || bh === "" ||
            (bh.rlike(SchemeLike) && !bh.rlike(Hierarchical)), u)
          .otherwise(UrlCanonical.resolve(u, bh))
      }
    }

  /** Keep only crawlable references: not a non-hierarchical scheme. */
  private def hierarchicalOnly(href: Column): Column =
    !(href.rlike(SchemeLike) && !href.rlike(Hierarchical))

  private[queries] def outlinkEdges(s: SparkSession, dir: String): DataFrame =
    pagesWithBase(s, dir)
      .select(col("doc_id"), col("__base"),
        UrlCanonical.canonicalize(col("__url")).as("src_canon"),
        posexplode_outer(HtmlExtract.hrefs(col("payload")))
          .as(Seq("link_idx", "__raw")))
      .filter(col("__raw").isNotNull)
      .withColumn("href", HtmlExtract.decodeEntities(col("__raw")))
      .filter(hierarchicalOnly(col("href")))
      .select(col("doc_id"), col("link_idx").cast("long").as("link_idx"),
        col("href"), col("src_canon"),
        UrlCanonical.canonicalize(
          UrlCanonical.resolve(col("__base"), col("href"))).as("dst_canon"))

  /** q150: the outlink edges themselves, gate-hashed — a reference
    * class resolved wrong (merge, dot segments, query/fragment
    * semantics), an entity left in an href, a screen that leaks
    * mailto:, or a canonicalization divergence on either endpoint all
    * hash-mismatch against the oracle's replay of the identical chain. */
  def q150Outlinks(s: SparkSession, dir: String): DataFrame =
    outlinkEdges(s, dir)

  val q150Sql: String =
    s"""WITH $outlinkCtePrefix
       |SELECT lf.doc_id, lf.link_idx, lf.href,
       |  s4.canon AS src_canon, d4.canon AS dst_canon
       |FROM lf JOIN s4 ON lf.doc_id = s4.doc_id
       |        JOIN d4 ON lf.doc_id = d4.doc_id AND lf.link_idx = d4.link_idx""".stripMargin

  // ---------------------- q181 redirect-aware host edges (r19)

  /** q181 (r19, beyond plan): the link graph with server redirects
    * COLLAPSED — an edge to a URL whose capture 3xx-redirects credits
    * the chain's FINAL target (the classic link-graph canonicalization:
    * a page linking `http://a/old` endorses whatever `/old` now IS;
    * ranking the redirect source splits authority across aliases).
    * q150's outlink edges left-join the resolved redirect relation
    * (q176's machinery — settled, non-looping chains only; a loop
    * credits nobody reachable, so the edge keeps its literal target),
    * then collapse to distinct host→host edges, self-loops out — the
    * drop-in replacement for q151's input. One canon-keyed join (the
    * redirect relation is the 3xx slice) on top of the map-only q150
    * chain + the same host-distinct exchange. */
  def q181RedirectAwareEdges(s: SparkSession, dir: String): DataFrame = {
    val (_, resolved) = CorpusOps.redirectResolved(s, dir)
    val rmap = resolved
      .filter(col("hops") > 0 && !col("is_loop") && col("settled"))
      .select(col("node"), col("final_node"))
    outlinkEdges(s, dir)
      .join(graft.operators.AdaptiveJoin.broadcastIfSmall(rmap),
        col("dst_canon") === col("node"), "left")
      .select(UrlCanonical.hostOfCanon(col("src_canon")).as("src_host"),
        UrlCanonical.hostOfCanon(
          coalesce(col("final_node"), col("dst_canon"))).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .distinct()
  }

  val q181Sql: String = {
    val hostDst =
      UrlCanonical.duckHostOf("coalesce(m.final_canon, d4.canon)")
    val hostSrc = UrlCanonical.duckHostOf("s4.canon")
    s"""WITH $outlinkCtePrefix,
       |${CorpusOps.duckRedirectCtes(Seq("bücher" -> "xn--bcher-kva"))},
       |rmap AS (
       |  SELECT node, final_canon FROM rres
       |  WHERE hops > 0 AND NOT is_loop AND settled)
       |SELECT DISTINCT $hostSrc AS src_host, $hostDst AS dst_host
       |FROM lf JOIN s4 ON lf.doc_id = s4.doc_id
       |        JOIN d4 ON lf.doc_id = d4.doc_id AND lf.link_idx = d4.link_idx
       |LEFT JOIN rmap m ON d4.canon = m.node
       |WHERE $hostSrc <> $hostDst""".stripMargin
  }

  // ------------------------------------------------ q151 host PageRank

  private val Iterations = 3
  private val Scale = 1000000L
  private val Base = 150000L // Scale * (100-85)/100

  /** q151: PageRank over the HOST graph q150's edges induce — collapse
    * both endpoints to hosts, drop intra-host links (self-loops carry
    * no authority), distinct, rank. Hosts are keyed by h60(host) for
    * the long-keyed PageRank engine (injective in practice: a 60-bit
    * hash over the corpus's host cardinality; the oracle ranks over
    * host STRINGS, so an engine-side collision would hash-mismatch the
    * gate, not silently merge) and the names join back over the
    * host-cardinality broadcast relation. Output: (host, pr), integer
    * fixed-point — bit-exact against the oracle's chained-CTE replay. */
  def q151HostRank(s: SparkSession, dir: String): DataFrame = hostRanks(s, dir)

  /** (host, pr) — the shared builder q151 gates and q156 composes. */
  private def hostRanks(s: SparkSession, dir: String): DataFrame =
    hostRanksCounted(s, dir)._1

  /** [[hostRanks]] plus its measured NODE cardinality — the count the
    * adaptive name join already paid for, threaded to q156's quota
    * join (whose row count equals the rank relation's ≤ this), so the
    * chain runs exactly ONE strategy-count job (VERDICT r17 wrong #2;
    * PlanAuditSpec asserts via AdaptiveJoin.measuredProbes). */
  private def hostRanksCounted(s: SparkSession, dir: String): (DataFrame, Long) =
    rankOverHostEdges(outlinkEdges(s, dir)
      .select(UrlCanonical.hostOfCanon(col("src_canon")).as("src_host"),
        UrlCanonical.hostOfCanon(col("dst_canon")).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .distinct())

  /** The h60-keyed integer PageRank over any distinct
    * `(src_host, dst_host)` relation, plus the measured node count —
    * shared by the full-graph rank (q151/q156/q168) and the
    * followed-edge rank (q173). */
  private def rankOverHostEdges(hostEdges: DataFrame): (DataFrame, Long) = {
    val scope = graft.CacheScope.scoped()
    val edges = scope.cache(hostEdges.select(
      Portable.h60(col("src_host")).as("src"),
      Portable.h60(col("dst_host")).as("dst"),
      col("src_host"), col("dst_host")))
    // scope-cached: the adaptive strategy COUNT and the name join both
    // consume this relation — uncached, the distinct ran twice (the
    // r17 q156 A/B's 1.2× attribution)
    val names = scope.cache(
      edges.select(col("src").as("node"), col("src_host").as("host"))
        .unionByName(edges.select(col("dst").as("node"), col("dst_host").as("host")))
        .distinct())
    val ranks = PageRank.run(edges.select(col("src"), col("dst")),
      "src", "dst", Iterations, scale = Scale, scope = Some(scope))
    // names is HOST-cardinality: broadcast only under the measured
    // ceiling, shuffled hash join past it (VERDICT r16 wrong #1 — at
    // 10⁷–10⁸ real-web hosts the relation is past any broadcast limit;
    // the count is one cheap job over the cached edge relation, and
    // its RESULT rides along for q156's quota join)
    val (namesJoin, nNames) =
      graft.operators.AdaptiveJoin.broadcastIfSmallCounted(names)
    (scope.materializeAndRelease(
      ranks.join(namesJoin, Seq("node"))
        .select(col("host"), col("pr"))), nNames)
  }

  /** q110Sql's chained-CTE integer PageRank, over host strings (the
    * oracle never needs the engine's h60 keys — rank depends only on
    * graph structure, so a key collision cannot hide). */
  /** The q150 chain + host-edge collapse + rank sweeps as CTEs,
    * exposing `r$Iterations (node = host, pr)` — shared by q151/q156. */
  private def hostRankCtes: String = {
    val edgeSelect =
      s"""SELECT DISTINCT ${UrlCanonical.duckHostOf("s4.canon")} AS src,
         |  ${UrlCanonical.duckHostOf("d4.canon")} AS dst
         |FROM lf JOIN s4 ON lf.doc_id = s4.doc_id
         |        JOIN d4 ON lf.doc_id = d4.doc_id AND lf.link_idx = d4.link_idx
         |WHERE ${UrlCanonical.duckHostOf("s4.canon")} <> ${UrlCanonical.duckHostOf("d4.canon")}""".stripMargin
    s"""$outlinkCtePrefix,
       |e AS (
       |$edgeSelect),
       |$rankSweepCtes""".stripMargin
  }

  /** The integer PageRank sweep as CTEs over an already-defined edge
    * CTE `e (src, dst)` → exposes `r$Iterations (node, pr)`. Shared by
    * the q151/q156/q168 chain and the followed-edge rank (q173). */
  private def rankSweepCtes: String = {
    val out = new StringBuilder
    out ++= s"""deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, ${Scale}::BIGINT AS pr FROM n)""".stripMargin
    for (i <- 1 to Iterations) {
      out ++= s""",
        |c$i AS (SELECT e.dst AS node, CAST(sum((85 * r.pr) // (100 * d.outdeg)) AS BIGINT) AS in_c
        |       FROM e JOIN r${i - 1} r ON e.src = r.node
        |              JOIN deg d ON e.src = d.src
        |       GROUP BY e.dst),
        |r$i AS (SELECT n.node, CAST($Base + coalesce(c.in_c, 0) AS BIGINT) AS pr
        |       FROM n LEFT JOIN c$i c ON c.node = n.node)""".stripMargin
    }
    out.toString
  }

  val q151Sql: String =
    s"WITH $hostRankCtes\nSELECT node AS host, pr FROM r$Iterations"

  // -------------------------------------------- q155 anchor-text pairs

  /** q155: (href, anchor_text) pairs per page — the link-TEXT signal
    * (anchor-text retrieval pair mining, link-context quality
    * features). The unit is a COMPLETE href-bearing anchor element
    * (HtmlExtract.anchors), so q150 stays the maximal-recall edge set
    * (an unclosed <a href> is an outlink with no text) and q155 the
    * text-bearing subset; targets resolve + canonicalize through the
    * identical chain. Map-only after the zone read. */
  def q155AnchorText(s: SparkSession, dir: String): DataFrame =
    pagesWithBase(s, dir)
      .select(col("doc_id"), col("__base"),
        posexplode_outer(HtmlExtract.anchors(col("payload")))
          .as(Seq("link_idx", "__a")))
      .filter(col("__a").isNotNull)
      .withColumn("href",
        HtmlExtract.decodeEntities(HtmlExtract.anchorHref(col("__a"))))
      .filter(hierarchicalOnly(col("href")))
      .select(col("doc_id"), col("link_idx").cast("long").as("link_idx"),
        col("href"),
        HtmlExtract.anchorText(col("__a")).as("anchor_text"),
        UrlCanonical.canonicalize(
          UrlCanonical.resolve(col("__base"), col("href"))).as("dst_canon"))

  /** The q155 CTE chain WITHOUT the leading WITH/final SELECT —
    * exposes `af (doc_id, link_idx, href, anchor_text)` and
    * `d4 (doc_id, link_idx, canon)`; shared by q155 and q178. */
  private def anchorCtePrefix: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |al AS (
       |  SELECT doc_id, ${HtmlExtract.duckAnchors("html")} AS l FROM hin),
       |ax AS (
       |  SELECT doc_id, unnest(range(len(l))) AS link_idx, unnest(l) AS a
       |  FROM al),
       |af AS (
       |  SELECT * FROM (
       |    SELECT doc_id, link_idx,
       |      ${HtmlExtract.duckEntities(HtmlExtract.duckAnchorHref("a"))} AS href,
       |      ${HtmlExtract.duckAnchorText("a")} AS anchor_text
       |    FROM ax, entmap)
       |  WHERE NOT (regexp_matches(href, '$SchemeLike')
       |             AND NOT regexp_matches(href, '$Hierarchical'))),
       |rin AS (
       |  SELECT af.doc_id, af.link_idx, e.url AS base, af.href AS ref
       |  FROM af JOIN ebase e ON af.doc_id = e.doc_id),
       |${UrlCanonical.duckResolveCtes("rin", "doc_id, link_idx", "rv")},
       |tin AS (SELECT doc_id, link_idx, target AS url FROM rv4),
       |${UrlCanonical.duckCanonCtes("tin", "doc_id, link_idx", idn, "d")}""".stripMargin
  }

  val q155Sql: String =
    s"""WITH $anchorCtePrefix
       |SELECT af.doc_id, af.link_idx, af.href, af.anchor_text,
       |  d4.canon AS dst_canon
       |FROM af JOIN d4 ON af.doc_id = d4.doc_id AND af.link_idx = d4.link_idx""".stripMargin

  // ------------------------------ q178 per-target anchor aggregation

  /** Terms kept per destination — the classic capped anchor list. */
  private val AnchorTermsK = 8

  /** q178 (r19, VERDICT r18 next #5): the INVERTED anchor relation —
    * per destination URL, the top-[[AnchorTermsK]] anchor TERMS with
    * their link frequency and document frequency (the retrieval signal
    * anchor text exists for: what the web calls a page). Terms are the
    * lowercase `[a-z0-9]+` runs of q155's anchor texts; ranking is
    * n_links DESC then term (unique within a destination → total
    * order, the window-tie discipline).
    *
    * Scale shape: tokenize/explode is map-only on top of the q155
    * chain; ONE partial-aggregated exchange on (dst, term) — the
    * map-side combine collapses the web's hugely repetitive anchor
    * vocabulary before the shuffle — then the per-dst rank window
    * pre-truncates map-side ([[graft.operators.QuotaCap]]'s
    * WindowGroupLimit shape, plan-asserted): a URL with 10⁹ in-links
    * costs each mapper at most K rows of the second (aggregated,
    * term-cardinality) exchange. */
  def q178AnchorTerms(s: SparkSession, dir: String): DataFrame = {
    val terms = q155AnchorText(s, dir)
      .select(col("doc_id"), col("dst_canon"),
        explode(regexp_extract_all(lower(col("anchor_text")),
          lit("[a-z0-9]+"), lit(0))).as("term"))
    val agg = terms.groupBy(col("dst_canon"), col("term"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_canon"))
      .orderBy(col("n_links").desc, col("term"))
    agg.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= AnchorTermsK)
      .select(col("dst_canon"), col("term"), col("n_links"), col("n_docs"),
        col("term_rank").cast("long").as("term_rank"))
  }

  val q178Sql: String =
    s"""WITH $anchorCtePrefix,
       |ap AS (
       |  SELECT af.doc_id, d4.canon AS dst_canon, af.anchor_text
       |  FROM af JOIN d4 ON af.doc_id = d4.doc_id AND af.link_idx = d4.link_idx),
       |tm AS (
       |  SELECT doc_id, dst_canon,
       |    unnest(regexp_extract_all(lower(anchor_text), '[a-z0-9]+')) AS term
       |  FROM ap),
       |ag AS (
       |  SELECT dst_canon, term, count(*) AS n_links,
       |    count(DISTINCT doc_id) AS n_docs
       |  FROM tm GROUP BY dst_canon, term)
       |SELECT dst_canon, term, n_links, n_docs,
       |  CAST(row_number() OVER (PARTITION BY dst_canon
       |    ORDER BY n_links DESC, term) AS BIGINT) AS term_rank
       |FROM ag
       |QUALIFY term_rank <= $AnchorTermsK""".stripMargin

  // ----------------------------------- q169 rel=nofollow link semantics

  /** q169 (r18, beyond plan): link-ATTRIBUTE semantics — the `rel`
    * token list of every resolvable outlink with its `nofollow`
    * verdict (HTML §4.6.6: rel is space-separated tokens,
    * case-insensitive; `nofollow` is THE link-level signal a PageRank
    * or frontier build must screen — the original sculpting-resistant
    * semantics). The unit is the COMPLETE anchor open tag
    * ([[HtmlExtract.hrefTags]] — attributes live there), so the
    * substring trap (`rel="nofollower"`) and the attribute-order trap
    * (rel before href) are both in the fixture. Resolution composes
    * the same §5.1.1 base chain as q150. Map-only after the zone
    * read. */
  def q169NofollowEdges(s: SparkSession, dir: String): DataFrame =
    pagesWithBase(s, dir)
      .select(col("doc_id"), col("__base"),
        posexplode_outer(HtmlExtract.hrefTags(col("payload")))
          .as(Seq("tag_idx", "__t")))
      .filter(col("__t").isNotNull)
      .withColumn("href",
        HtmlExtract.decodeEntities(HtmlExtract.tagHref(col("__t"))))
      .filter(hierarchicalOnly(col("href")))
      .select(col("doc_id"), col("tag_idx").cast("long").as("tag_idx"),
        col("href"),
        lower(HtmlExtract.tagRel(col("__t"))).as("rel"),
        HtmlExtract.relHasNofollow(HtmlExtract.tagRel(col("__t")))
          .as("nofollow"),
        UrlCanonical.canonicalize(
          UrlCanonical.resolve(col("__base"), col("href"))).as("dst_canon"))

  val q169Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |tl AS (
       |  SELECT doc_id, ${HtmlExtract.duckHrefTags("html")} AS l FROM hin),
       |tx AS (
       |  SELECT doc_id, unnest(range(len(l))) AS tag_idx, unnest(l) AS t
       |  FROM tl),
       |tf AS (
       |  SELECT * FROM (
       |    SELECT doc_id, tag_idx,
       |      ${HtmlExtract.duckEntities(HtmlExtract.duckTagHref("t"))} AS href,
       |      lower(${HtmlExtract.duckTagRel("t")}) AS rel,
       |      ${HtmlExtract.duckRelHasNofollow(HtmlExtract.duckTagRel("t"))} AS nofollow
       |    FROM tx, entmap)
       |  WHERE NOT (regexp_matches(href, '$SchemeLike')
       |             AND NOT regexp_matches(href, '$Hierarchical'))),
       |rin AS (
       |  SELECT tf.doc_id, tf.tag_idx, e.url AS base, tf.href AS ref
       |  FROM tf JOIN ebase e ON tf.doc_id = e.doc_id),
       |${UrlCanonical.duckResolveCtes("rin", "doc_id, tag_idx", "rv")},
       |tin AS (SELECT doc_id, tag_idx, target AS url FROM rv4),
       |${UrlCanonical.duckCanonCtes("tin", "doc_id, tag_idx", idn, "d")}
       |SELECT tf.doc_id, tf.tag_idx, tf.href, tf.rel, tf.nofollow,
       |  d4.canon AS dst_canon
       |FROM tf JOIN d4 ON tf.doc_id = d4.doc_id AND tf.tag_idx = d4.tag_idx""".stripMargin
  }

  // ------------------------------------ q171 followed host-edge relation

  /** q171 (r18, beyond plan): the edge set a POLITE rank uses — q169's
    * outlinks with BOTH nofollow channels honored: the link-level rel
    * token drops the edge, and a page whose robots-meta says
    * nofollow/none drops ALL its edges (the page-level directive
    * composes from the same zone payloads — q170's extraction).
    * Collapsed to distinct host→host edges (self-loops out), exactly
    * the relation PageRank consumes; the host graph here is a strict
    * subset of q151's. One distinct on a host-cardinality relation —
    * everything upstream is map-only. */
  def q171FollowedEdges(s: SparkSession, dir: String): DataFrame =
    // ONE zone pass: the page-level verdict computes per page and
    // drops the page BEFORE its tags explode (a nofollow page's edges
    // never materialize), then the link-level screen and resolution
    // run on what's left — no second scan, no doc_id join (the r18
    // 10× sweep read the two-scan join shape at 7.7×; this is the
    // fused map-only shape)
    pagesWithBase(s, dir)
      .withColumn("__pnf",
        UrlCanonical.let(HtmlExtract.metaRobotsContents(col("payload"))) { c =>
          HtmlExtract.metaDirective(c, "nofollow") ||
            HtmlExtract.metaDirective(c, "none")
        })
      .filter(!col("__pnf"))
      .select(col("doc_id"), col("__base"),
        UrlCanonical.hostOfCanon(
          UrlCanonical.canonicalize(col("__url"))).as("src_host"),
        posexplode_outer(HtmlExtract.hrefTags(col("payload")))
          .as(Seq("tag_idx", "__t")))
      .filter(col("__t").isNotNull)
      .filter(!HtmlExtract.relHasNofollow(HtmlExtract.tagRel(col("__t"))))
      .withColumn("href",
        HtmlExtract.decodeEntities(HtmlExtract.tagHref(col("__t"))))
      .filter(hierarchicalOnly(col("href")))
      .select(col("src_host"),
        UrlCanonical.hostOfCanon(UrlCanonical.canonicalize(
          UrlCanonical.resolve(col("__base"), col("href")))).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .distinct()

  /** The q171 chain as CTEs → exposes `fe (src_host, dst_host)` —
    * shared by q171's gate SELECT and q173's rank sweep. */
  private def followedEdgeCtes: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |pnf AS (
       |  SELECT doc_id,
       |    (${HtmlExtract.duckMetaDirective("c", "nofollow")}
       |     OR ${HtmlExtract.duckMetaDirective("c", "none")}) AS page_nf
       |  FROM (SELECT doc_id,
       |          ${HtmlExtract.duckMetaRobotsContents("html")} AS c
       |        FROM hin)),
       |tl AS (
       |  SELECT doc_id, ${HtmlExtract.duckHrefTags("html")} AS l FROM hin),
       |tx AS (
       |  SELECT doc_id, unnest(range(len(l))) AS tag_idx, unnest(l) AS t
       |  FROM tl),
       |tf AS (
       |  SELECT * FROM (
       |    SELECT doc_id, tag_idx,
       |      ${HtmlExtract.duckEntities(HtmlExtract.duckTagHref("t"))} AS href,
       |      ${HtmlExtract.duckRelHasNofollow(HtmlExtract.duckTagRel("t"))} AS nofollow
       |    FROM tx, entmap)
       |  WHERE NOT (regexp_matches(href, '$SchemeLike')
       |             AND NOT regexp_matches(href, '$Hierarchical'))),
       |ff AS (
       |  SELECT tf.doc_id, tf.tag_idx, tf.href
       |  FROM tf JOIN pnf ON tf.doc_id = pnf.doc_id
       |  WHERE NOT tf.nofollow AND NOT pnf.page_nf),
       |rin AS (
       |  SELECT ff.doc_id, ff.tag_idx, e.url AS base, ff.href AS ref
       |  FROM ff JOIN ebase e ON ff.doc_id = e.doc_id),
       |${UrlCanonical.duckResolveCtes("rin", "doc_id, tag_idx", "rv")},
       |tin AS (SELECT doc_id, tag_idx, target AS url FROM rv4),
       |${UrlCanonical.duckCanonCtes("tin", "doc_id, tag_idx", idn, "d")},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |fe AS (
       |  SELECT DISTINCT ${UrlCanonical.duckHostOf("s4.canon")} AS src_host,
       |    ${UrlCanonical.duckHostOf("d4.canon")} AS dst_host
       |  FROM d4 JOIN s4 ON d4.doc_id = s4.doc_id
       |  WHERE ${UrlCanonical.duckHostOf("s4.canon")}
       |        <> ${UrlCanonical.duckHostOf("d4.canon")})""".stripMargin
  }

  val q171Sql: String =
    s"WITH $followedEdgeCtes\nSELECT src_host, dst_host FROM fe"

  // -------------------------------------- q173 followed-edge host rank

  /** q173 (r18, beyond plan): PageRank over the FOLLOWED edge set —
    * the sculpting-resistant domain-authority signal nofollow exists
    * for: links marked nofollow (and every link on a robots-meta
    * nofollow page) contribute NO authority. Same rank machinery as
    * q151 (h60 keys, integer fixed-point, adaptive name join, one
    * measured count) over q171's edge relation; on this fixture the
    * followed graph is a strict subgraph of q151's, so ranks shift
    * exactly where sculpted links were propping hosts up. */
  def q173FollowedRank(s: SparkSession, dir: String): DataFrame =
    rankOverHostEdges(q171FollowedEdges(s, dir))._1

  val q173Sql: String =
    s"""WITH $followedEdgeCtes,
       |e AS (SELECT src_host AS src, dst_host AS dst FROM fe),
       |$rankSweepCtes
       |SELECT node AS host, pr FROM r$Iterations""".stripMargin

  // ---------------------- q182 hreflang alternate clusters (r19)

  /** q182 (r19, beyond plan): the hreflang ALTERNATE relation — the
    * signal a multilingual corpus build clusters parallel documents on
    * (translation variants declare each other via
    * `<link rel=alternate hreflang>`). One row per declaring tag in
    * document order: the BCP 47 tag lowercased (RFC 5646 §2.1.1 —
    * case-insensitive, so `DE-at` keys as `de-at`; `x-default` passes
    * through), the raw href, and the target decoded + resolved against
    * the page's EFFECTIVE base (a relative alternate composes with
    * `<base href>`) and canonicalized into the engine's key space.
    * Fixture traps: case-variant region tag, relative href, swapped
    * attribute order, an RSS alternate WITHOUT hreflang (never
    * counts), and a `rel="alternatexx"` substring trap. Map-only
    * after the zone read. */
  def q182HreflangAlternates(s: SparkSession, dir: String): DataFrame =
    pagesWithBase(s, dir)
      .select(col("doc_id"), col("__base"),
        posexplode_outer(HtmlExtract.alternateLinks(col("payload")))
          .as(Seq("alt_idx", "__t")))
      .filter(col("__t").isNotNull)
      .withColumn("hreflang", HtmlExtract.linkHreflang(col("__t")))
      .withColumn("href",
        HtmlExtract.decodeEntities(HtmlExtract.linkHref(col("__t"))))
      .filter(col("href") =!= "" && hierarchicalOnly(col("href")))
      .select(col("doc_id"), col("alt_idx").cast("long").as("alt_idx"),
        col("hreflang"), col("href"),
        UrlCanonical.canonicalize(
          UrlCanonical.resolve(col("__base"), col("href"))).as("alt_canon"))

  val q182Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |hl2 AS (
       |  SELECT doc_id, ${HtmlExtract.duckAlternateLinks("html")} AS l
       |  FROM hin),
       |hx2 AS (
       |  SELECT doc_id, unnest(range(len(l))) AS alt_idx, unnest(l) AS t
       |  FROM hl2),
       |hf2 AS (
       |  SELECT * FROM (
       |    SELECT doc_id, alt_idx,
       |      ${HtmlExtract.duckLinkHreflang("t")} AS hreflang,
       |      ${HtmlExtract.duckEntities(HtmlExtract.duckLinkHref("t"))} AS href
       |    FROM hx2, entmap)
       |  WHERE href <> ''
       |    AND NOT (regexp_matches(href, '$SchemeLike')
       |             AND NOT regexp_matches(href, '$Hierarchical'))),
       |rin AS (
       |  SELECT hf2.doc_id, hf2.alt_idx, e.url AS base, hf2.href AS ref
       |  FROM hf2 JOIN ebase e ON hf2.doc_id = e.doc_id),
       |${UrlCanonical.duckResolveCtes("rin", "doc_id, alt_idx", "rv")},
       |tin AS (SELECT doc_id, alt_idx, target AS url FROM rv4),
       |${UrlCanonical.duckCanonCtes("tin", "doc_id, alt_idx", idn, "d")}
       |SELECT hf2.doc_id, hf2.alt_idx, hf2.hreflang, hf2.href,
       |  d4.canon AS alt_canon
       |FROM hf2 JOIN d4 ON hf2.doc_id = d4.doc_id
       |                AND hf2.alt_idx = d4.alt_idx""".stripMargin
  }

  // --------------------------------- q172 canonical-link consolidation

  /** q172 (r18, beyond plan): the `<link rel="canonical">` signal —
    * pages declaring their authoritative URL, the consolidation key a
    * corpus build clusters on BEFORE content dedup (mirror/variant
    * pages collapse onto one canonical holder). The declared target is
    * entity-decoded and resolved against the page's effective base
    * (§5.1.1 — a relative canonical composes with `<base href>`), then
    * canonicalized into the engine's key space; `dedup_key` falls back
    * to the page's own canonical form when no link is declared.
    * Fixture classes: an absolute SELF canonical (is_self must be
    * true THROUGH the messy-URL normalization), a root-relative
    * target, an attribute-order-swapped case-variant rel, and a
    * stylesheet link decoy on every page. Map-only after the zone
    * read. */
  def q172CanonicalLink(s: SparkSession, dir: String): DataFrame =
    pagesWithBase(s, dir)
      .withColumn("__ch",
        HtmlExtract.decodeEntities(HtmlExtract.canonicalHref(col("payload"))))
      .select(col("doc_id"),
        UrlCanonical.canonicalize(col("__url")).as("self_canon"),
        UrlCanonical.let(col("__ch")) { ch =>
          when(ch.isNull || ch === "" ||
              (ch.rlike(SchemeLike) && !ch.rlike(Hierarchical)),
            lit(null))
            .otherwise(UrlCanonical.canonicalize(
              UrlCanonical.resolve(col("__base"), ch)))
        }.as("canonical_canon"))
      .withColumn("is_self",
        coalesce(col("canonical_canon") === col("self_canon"), lit(false)))
      .withColumn("dedup_key",
        coalesce(col("canonical_canon"), col("self_canon")))

  val q172Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |ch0 AS (
       |  SELECT doc_id,
       |    ${HtmlExtract.duckEntities(HtmlExtract.duckCanonicalHref("html"))} AS ch
       |  FROM hin, entmap),
       |cri AS (
       |  SELECT c.doc_id, e.url AS base, c.ch AS ref
       |  FROM ch0 c JOIN ebase e ON c.doc_id = e.doc_id
       |  WHERE c.ch IS NOT NULL AND c.ch <> ''
       |    AND NOT (regexp_matches(c.ch, '$SchemeLike')
       |             AND NOT regexp_matches(c.ch, '$Hierarchical'))),
       |${UrlCanonical.duckResolveCtes("cri", "doc_id", "cn")},
       |ctin AS (SELECT doc_id, target AS url FROM cn4),
       |${UrlCanonical.duckCanonCtes("ctin", "doc_id", idn, "cx")},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")}
       |SELECT h.doc_id, s4.canon AS self_canon, cx4.canon AS canonical_canon,
       |  coalesce(cx4.canon = s4.canon, false) AS is_self,
       |  coalesce(cx4.canon, s4.canon) AS dedup_key
       |FROM hin h
       |JOIN s4 ON h.doc_id = s4.doc_id
       |LEFT JOIN cx4 ON h.doc_id = cx4.doc_id""".stripMargin
  }

  // --------------------------------------- q156 rank-weighted host quota

  /** Per-host base quota multiplier — the highest-ranked host keeps
    * [[QuotaMax]] documents, others proportionally fewer (floor 1). */
  private val QuotaMax = 50L

  /** q156: AUTHORITY-WEIGHTED domain quotas — the C4/CCNet domain cap
    * with the cap scaled by q151's host rank instead of one global
    * constant (high-authority domains contribute more documents, spam
    * farms get the floor). quota(host) = max(1, (QuotaMax·pr) div
    * max_pr) — non-negative integer division, floor ≡ truncate on both
    * engines; per-host keep = the quota lowest doc_ids (deterministic).
    * Exchanges: the rank machinery's own + ONE host-partitioned window
    * over the doc→host relation (the quota shape every domain cap
    * pays). */
  def q156RankQuota(s: SparkSession, dir: String): DataFrame = {
    val (ranks, nNames) = hostRanksCounted(s, dir)
    // spread: the per-doc canonicalization below is expression-heavy
    // and the testdata's one-row-group parquet pins it to ONE task
    // otherwise (r19 optimization; no-op on multi-split corpora)
    val docs = Tables.spread(s, Tables.documents(s, dir)).select(col("doc_id"),
      UrlCanonical.hostOfCanon(
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol)).as("host"))
    val mx = ranks.agg(max(col("pr")).as("mp"))
    val quotas = ranks.crossJoin(broadcast(mx))
      .select(col("host"), col("pr"),
        greatest(lit(1L), expr(s"($QuotaMax * pr) div mp")).as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("doc_id"))
    // quotas is host-cardinality — adaptive for the same reason as
    // hostRanks' name join, but REUSING that join's measurement:
    // |quotas| = |ranks| ≤ the name count already paid for (an upper
    // bound only errs toward the shuffle branch), so no second
    // strategy-count job runs (VERDICT r17 wrong #2)
    docs.join(graft.operators.AdaptiveJoin.broadcastIfSmall(quotas,
        knownRows = Some(nNames)), Seq("host"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("host"), col("pr"), col("quota"),
        col("rn"), (col("rn") <= col("quota")).as("kept"))
  }

  /** q168 (VERDICT r17 wrong #4): the FILTERING consumer of the q156
    * quota — kept documents only. q156 stays the audit shape (every doc
    * with its verdict — that window inherently sees all rows); this is
    * the shape a curation pass actually materializes, routed through
    * [[graft.operators.QuotaCap.capPerGroupDynamic]] so each map task
    * pre-truncates to [[QuotaMax]] rows per host BEFORE the window
    * exchange (quota ≤ QuotaMax always, since pr ≤ max pr): a
    * pathologically hot host costs every mapper at most QuotaMax rows
    * of shuffle instead of funneling whole through one partition.
    * PlanAuditSpec asserts the WindowGroupLimit is in the plan. */
  def q168QuotaKept(s: SparkSession, dir: String): DataFrame = {
    val (ranks, nNames) = hostRanksCounted(s, dir)
    // spread: the per-doc canonicalization below is expression-heavy
    // and the testdata's one-row-group parquet pins it to ONE task
    // otherwise (r19 optimization; no-op on multi-split corpora)
    val docs = Tables.spread(s, Tables.documents(s, dir)).select(col("doc_id"),
      UrlCanonical.hostOfCanon(
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol)).as("host"))
    val mx = ranks.agg(max(col("pr")).as("mp"))
    val quotas = ranks.crossJoin(broadcast(mx))
      .select(col("host"), col("pr"),
        greatest(lit(1L), expr(s"($QuotaMax * pr) div mp")).as("quota"))
    graft.operators.QuotaCap.capPerGroupDynamic(
        docs.join(graft.operators.AdaptiveJoin.broadcastIfSmall(quotas,
          knownRows = Some(nNames)), Seq("host")),
        Seq("host"), Seq(col("doc_id")),
        QuotaMax.toInt, col("quota"), "rn")
      .select(col("doc_id"), col("host"), col("pr"), col("quota"),
        col("rn").cast("long").as("rn"))
  }

  val q168Sql: String =
    s"""WITH $hostRankCtes,
       |hr AS (SELECT node AS host, pr FROM r$Iterations),
       |mx AS (SELECT max(pr) AS mp FROM hr),
       |qa AS (SELECT host, pr, greatest(1, ($QuotaMax * pr) // mp) AS quota
       |       FROM hr, mx),
       |dh AS (SELECT doc_id, ${UrlCanonical.duckHostOf("canon")} AS host
       |       FROM s4),
       |rt AS (SELECT doc_id, host,
       |         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
       |       FROM dh)
       |SELECT rt.doc_id, rt.host, qa.pr, qa.quota, rt.rn
       |FROM rt JOIN qa USING (host)
       |WHERE rt.rn <= qa.quota""".stripMargin

  val q156Sql: String =
    s"""WITH $hostRankCtes,
       |hr AS (SELECT node AS host, pr FROM r$Iterations),
       |mx AS (SELECT max(pr) AS mp FROM hr),
       |qa AS (SELECT host, pr, greatest(1, ($QuotaMax * pr) // mp) AS quota
       |       FROM hr, mx),
       |dh AS (SELECT doc_id, ${UrlCanonical.duckHostOf("canon")} AS host
       |       FROM s4),
       |rt AS (SELECT doc_id, host,
       |         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
       |       FROM dh)
       |SELECT rt.doc_id, rt.host, qa.pr, qa.quota, rt.rn,
       |  (rt.rn <= qa.quota) AS kept
       |FROM rt JOIN qa USING (host)""".stripMargin

  /** The effective-base CTE chain (RFC 3986 §5.1.1, mirrored from
    * [[pagesWithBase]]): first `<base href>` decoded; usable ones
    * (non-empty, hierarchical) resolved against the retrieval URI;
    * `ebase (doc_id, url)` = the resolution base per doc. Assumes
    * `entmap`, `hin`, and `mk` are in scope. */
  private def duckEbaseCtes: String =
    s"""bh1 AS (
       |  SELECT doc_id,
       |    ${HtmlExtract.duckEntities(HtmlExtract.duckBaseHref("html"))} AS bh
       |  FROM hin, entmap),
       |bri AS (
       |  SELECT b.doc_id, mk.url AS base, b.bh AS ref
       |  FROM bh1 b JOIN mk ON b.doc_id = mk.doc_id
       |  WHERE b.bh IS NOT NULL AND b.bh <> ''
       |    AND NOT (regexp_matches(b.bh, '$SchemeLike')
       |             AND NOT regexp_matches(b.bh, '$Hierarchical'))),
       |${UrlCanonical.duckResolveCtes("bri", "doc_id", "eb")},
       |ebase AS (
       |  SELECT mk.doc_id, coalesce(eb4.target, mk.url) AS url
       |  FROM mk LEFT JOIN eb4 ON mk.doc_id = eb4.doc_id)""".stripMargin

  /** The q150 CTE chain WITHOUT the leading WITH/final SELECT — the
    * reusable prefix q151 builds on. */
  private def outlinkCtePrefix: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""${HtmlExtract.duckEntmapCte},
       |${CorpusOps.htmlInCtes},
       |${CorpusOps.messyUrlMkCte},
       |$duckEbaseCtes,
       |hl AS (
       |  SELECT doc_id, ${HtmlExtract.duckHrefs("html")} AS l FROM hin),
       |lx AS (
       |  SELECT doc_id, unnest(range(len(l))) AS link_idx, unnest(l) AS rawref
       |  FROM hl),
       |lf AS (
       |  SELECT * FROM (
       |    SELECT doc_id, link_idx,
       |      ${HtmlExtract.duckEntities("rawref")} AS href
       |    FROM lx, entmap)
       |  WHERE NOT (regexp_matches(href, '$SchemeLike')
       |             AND NOT regexp_matches(href, '$Hierarchical'))),
       |rin AS (
       |  SELECT lf.doc_id, lf.link_idx, e.url AS base, lf.href AS ref
       |  FROM lf JOIN ebase e ON lf.doc_id = e.doc_id),
       |${UrlCanonical.duckResolveCtes("rin", "doc_id, link_idx", "rv")},
       |tin AS (SELECT doc_id, link_idx, target AS url FROM rv4),
       |${UrlCanonical.duckCanonCtes("tin", "doc_id, link_idx", idn, "d")},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")}""".stripMargin
  }

  // ---------------------------------------------- q158 robots gate

  private val RobotsAgent = "graftbot"

  /** Per-host robots.txt fixture, two policy shapes by host parity:
    * even hosts carry an EXACT graftbot group (so the `*` group with
    * its blanket Disallow must be ignored — §2.2.1 group selection),
    * odd hosts have only `*` (the fallback level). Longest-match,
    * allow-on-tie, comment, unknown-directive (Crawl-delay) and
    * blank-line cases are all present. */
  private[graft] val EvenRobots: String = Seq(
    "# crawl policy (even host)",
    "User-agent: evilbot",
    "Disallow: /",
    "",
    "User-agent: graftbot",
    "Disallow: /Page/1",
    "Allow: /Page/12",
    "Allow: /Page/3",
    "Disallow: /Page/3",
    "Disallow: /Page/2/*usr",   // §2.2.3 wildcard — matches /Page/2/~usr
    "Disallow: /Page/4$",       // $-anchored — matches NOTHING (targets go on)
    "Allow: /Page/16*",         // longer than the /Page/1 deny → 16 survives
    "Disallow: /Page/7/*?*a=1", // QUERY-part rule (ADVICE r16): matches only
                                // because the target is path+query
    "Crawl-delay: 7",           // r18: the SELECTED group's delay — the
                                // scheduler honors it; rules ignore it
    "",
    "User-agent: *",
    "Crawl-delay: 2",           // must NOT leak into graftbot's schedule
                                // (the exact group wins selection)
    "Disallow: /").mkString("\n")

  private[graft] val OddRobots: String = Seq(
    "# crawl policy (odd host)",
    "User-agent: evilbot",
    "Disallow: /",
    "",
    "User-agent: *",
    "Crawl-delay: fast",        // r18: non-integer value — ignored, the
                                // host schedules at the default rate
    "Crawl-delay: 1.5",         // r19 (ADVICE r18): DECIMAL value — also
                                // ignored; an ungated cast would round it
                                // to 2 in DuckDB but NULL it in Spark
    "Disallow: /Page/1",
    "Disallow: /Page/5").mkString("\n")

  /** q158: RFC 9309 robots.txt evaluation over the canonical corpus —
    * per-doc (allowed, winning rule, rule path) for the pipeline's own
    * crawler token. The match target is PATH + QUERY
    * (UrlCanonical.pathQueryOfCanon — ADVICE r16: wildcard-query-class
    * rules must be able to match; the /Page/7 query rule in the even
    * fixture only fires because of it). Even hosts deny /Page/1* except
    * the longer /Page/12 allow and the /Page/3 allow-on-tie; odd hosts
    * fall back to their `*` group; the evilbot blanket-deny groups must
    * never leak into graftbot's verdicts. The oracle replays parse,
    * group selection and longest-match end to end
    * (text.Robots.duckRobotsCtes). */
  def q158RobotsGate(s: SparkSession, dir: String): DataFrame = {
    // spread: full-corpus canonicalization off a one-row-group scan
    // (r19 optimization; no-op on multi-split corpora)
    val docs = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"),
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("__c"),
        pmod(pmod(col("doc_id"), lit(13)), lit(2)).as("__par"))
      .select(col("doc_id"),
        UrlCanonical.hostOfCanon(col("__c")).as("host"),
        UrlCanonical.pathQueryOfCanon(col("__c")).as("path"), col("__par"))
    val robots = docs.select(col("host"), col("__par")).distinct()
      .select(col("host"),
        when(col("__par") === 0, lit(EvenRobots))
          .otherwise(lit(OddRobots)).as("txt"))
    val rs = graft.text.Robots.ruleSet(robots, col("host"), col("txt"))
    graft.text.Robots.allowed(docs.drop("__par"), rs, RobotsAgent)
      .select(col("doc_id"), col("host"), col("path"),
        col("allowed"), col("rule"), col("rule_path"))
  }

  private def sqlTextLit(text: String): String =
    text.split("\n", -1)
      .map(l => "'" + l.replace("'", "''") + "'")
      .mkString(" || chr(10) || ")

  val q158Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |dh AS (
       |  SELECT doc_id, ${UrlCanonical.duckHostOf("canon")} AS host,
       |    ${UrlCanonical.duckPathQueryOf("canon")} AS path,
       |    (doc_id % 13) % 2 AS par
       |  FROM s4),
       |rt AS (
       |  SELECT host, CASE WHEN par = 0 THEN ${sqlTextLit(EvenRobots)}
       |               ELSE ${sqlTextLit(OddRobots)} END AS txt
       |  FROM (SELECT DISTINCT host, par FROM dh)),
       |${graft.text.Robots.duckRobotsCtes("rt", "dh", RobotsAgent)}
       |SELECT doc_id, host, path, allowed, rule, rule_path FROM rb_out""".stripMargin
  }

  // -------------------------------------------- q159 sitemap frontier

  /** q159: sitemap `<loc>` extraction + corpus-membership diff — the
    * crawl-frontier view (sitemap entries the corpus already has vs
    * still needs). The per-host sitemap fixture lists the EVEN-doc_id
    * pages' canonical URLs with `&` XML-escaped as `&amp;` (the
    * sitemaps.org escaping the decoder must undo) plus one
    * `/extra/missing` entry per host that is NOT in the corpus — so
    * `in_corpus` carries both verdicts. Extraction/decode/canonicalize
    * are map-only; the only exchanges are the fixture's own per-host
    * build and the membership join against the distinct corpus keys. */
  def q159SitemapFrontier(s: SparkSession, dir: String): DataFrame = {
    // spread: see q158 (r19 optimization)
    val docs = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"),
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("canon"))
      .withColumn("host", UrlCanonical.hostOfCanon(col("canon")))
    val entries = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .groupBy(col("host"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("doc_id"),
          concat(lit("<url><loc> "),
            regexp_replace(col("canon"), "&", "&amp;"),
            lit(" </loc></url>")).as("e")))),
          x => x.getField("e")), "").as("body"))
    val xml = entries.select(col("host"),
      concat(lit("<?xml version=\"1.0\"?><urlset>"), col("body"),
        lit("<url><loc>http://"), col("host"),
        lit("/extra/missing</loc></url></urlset>")).as("xml"))
    val locs = graft.text.Sitemaps.locs(xml, col("xml")).drop("xml")
    val corpus = docs.select(col("canon").as("loc_canon")).distinct()
      .withColumn("__in", lit(true))
    locs.join(corpus, Seq("loc_canon"), "left")
      .select(col("host"), col("loc_idx"), col("loc_canon"),
        coalesce(col("__in"), lit(false)).as("in_corpus"))
  }

  val q159Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${graft.text.HtmlExtract.duckEntmapCte},
       |${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |dh AS (
       |  SELECT doc_id, canon, ${UrlCanonical.duckHostOf("canon")} AS host
       |  FROM s4),
       |ent AS (
       |  SELECT host,
       |    string_agg('<url><loc> ' || replace(canon, '&', '&amp;')
       |      || ' </loc></url>', '' ORDER BY doc_id) AS body
       |  FROM dh WHERE doc_id % 2 = 0 GROUP BY host),
       |xm AS (
       |  SELECT host, '<?xml version="1.0"?><urlset>' || body ||
       |    '<url><loc>http://' || host || '/extra/missing</loc></url></urlset>' AS xml
       |  FROM ent),
       |lx AS (
       |  SELECT host, unnest(range(len(l))) AS loc_idx, unnest(l) AS rawloc
       |  FROM (SELECT host, ${graft.text.Sitemaps.duckLocs("xml")} AS l FROM xm)),
       |ld AS (
       |  SELECT host, loc_idx,
       |    ${graft.text.HtmlExtract.duckEntities("rawloc")} AS url
       |  FROM lx, entmap),
       |${UrlCanonical.duckCanonCtes("ld", "host, loc_idx", idn, "d")},
       |cc AS (SELECT DISTINCT canon FROM dh)
       |SELECT d4.host, d4.loc_idx, d4.canon AS loc_canon,
       |  (cc.canon IS NOT NULL) AS in_corpus
       |FROM d4 LEFT JOIN cc ON d4.canon = cc.canon""".stripMargin
  }

  // ------------------------------- q160 ZONE-sourced robots gate (r17)

  private val robotsZones =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The Sitemap: discovery lines every USABLE robots body carries
    * (r17/r18): a ROOT index, a directly-discovered plain urlset, and a
    * shouting-case default-port dead variant. */
  private def sitemapLines(n: Column): Column = concat(
    lit("\nSitemap: http://site"), n.cast("string"),
    lit(".xn--bcher-kva.example/sm-root.xml"),
    lit("\nSitemap: http://site"), n.cast("string"),
    lit(".xn--bcher-kva.example/sm-direct.xml"),
    lit("\nSitemap: HTTP://SITE"), n.cast("string"),
    lit(".XN--BCHER-KVA.EXAMPLE:80/Dup.xml"))

  /** A MIXED WARC zone — ordinary page responses (the q136 shape,
    * UriPrefix Target-URIs, same corruption residues) interleaved with
    * one robots.txt capture per host (Target-URI
    * `http://site{n}.xn--bcher-kva.example/robots.txt`, payload the
    * Even/Odd policy by host parity) — the Common Crawl layout, where
    * robots responses are ordinary records in the same files
    * (VERDICT r16 next #2). Host 5's capture is written with
    * doc_id = 97, i.e. the Content-Length-overstated corruption class:
    * the record is INVALID, readExactClean drops it, and the engine
    * must fail OPEN for that host (no robots.txt → everything allowed)
    * — so the gate proves the rules really come from the zone.
    *
    * r19 — the HTTP SPINE (VERDICT r18 next #4): robots captures carry
    * a fetch-status channel through the extra-header seam (the q174
    * posture: payloads in this zone model are bare text, so the status
    * line and `Location` live on the capture record as `X-Crawl-Status`
    * / `Location`). Three hosts exercise RFC 9309 §2.3.1:
    *
    *   - host 7: status 404, body a POISON deny-all with a poison
    *     Sitemap line — §2.3.1.3 says unavailable = MAY access
    *     anything, so an engine that parses the body anyway flips both
    *     q160's verdicts AND q164's discovery;
    *   - host 9: status 503, body a POISON allow-all with poison
    *     Sitemap lines — §2.3.1.4 says unreachable = complete
    *     disallow;
    *   - host 11: status 301 with a RELATIVE Location to
    *     /robots-real.txt (resolution against the fetch URL is part of
    *     the machinery), poison body at the redirect SOURCE; the
    *     TARGET capture (doc_id 91 — dodges every corruption residue)
    *     carries host 11's real OddRobots policy + discovery lines and
    *     an explicit 200 — so host 11's q160/q164/q165/q167 rows are
    *     IDENTICAL to r18's, but only for an engine that follows the
    *     redirect. */
  private[queries] def robotsZoneFor(s: SparkSession, dir: String): String =
    robotsZones.computeIfAbsent(dir, { d =>
      val base = graft.TempArtifacts.dir("graft_warc_robots")
      val pages = Tables.documents(s, d).select(
        col("doc_id"), col("text"),
        concat(lit(graft.sources.Warc.UriPrefix),
          col("doc_id").cast("string")).as("url"),
        lit("").as("extra_headers"))
      val hostNs = Tables.documents(s, d)
        .select(pmod(col("doc_id"), lit(13)).as("n")).distinct()
      val robots = hostNs
        .select(
          when(col("n") === 5, lit(97L)).otherwise(col("n") + 1)
            .cast("long").as("doc_id"),
          when(col("n") === 7, concat(
              lit("User-agent: *\nDisallow: /\nSitemap: http://site"),
              col("n").cast("string"),
              lit(".xn--bcher-kva.example/POISON-404.xml")))
            .when(col("n") === 9, concat(
              lit("User-agent: *\nAllow: /\nSitemap: http://site"),
              col("n").cast("string"),
              lit(".xn--bcher-kva.example/POISON-503.xml")))
            .when(col("n") === 11, concat(
              lit("User-agent: *\nDisallow: /poison\nSitemap: http://site"),
              col("n").cast("string"),
              lit(".xn--bcher-kva.example/POISON-301.xml")))
            .otherwise(concat(
              when(pmod(col("n"), lit(2)) === 0, lit(EvenRobots))
                .otherwise(lit(OddRobots)),
              sitemapLines(col("n")))).as("text"),
          concat(lit("http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/robots.txt")).as("url"),
          when(col("n") === 7, lit("X-Crawl-Status: 404\r\n"))
            .when(col("n") === 9, lit("X-Crawl-Status: 503\r\n"))
            .when(col("n") === 11,
              lit("X-Crawl-Status: 301\r\nLocation: /robots-real.txt\r\n"))
            .otherwise(lit("")).as("extra_headers"))
      // host 11's REAL robots body lives at the redirect target
      val robotsReal = hostNs.filter(col("n") === 11)
        .select(lit(91L).as("doc_id"),
          concat(lit(OddRobots), sitemapLines(col("n"))).as("text"),
          concat(lit("http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/robots-real.txt")).as("url"),
          lit("X-Crawl-Status: 200\r\n").as("extra_headers"))
      // the DISCOVERED sitemap files are captures in the same zone
      // (r17 indexes at n+20; r18 roots at n+40, directs at n+60 — all
      // dodge every corruption residue, so every capture is valid —
      // host 5's stay UNDISCOVERABLE anyway because its robots capture
      // is corrupt)
      val indexes = sitemapIndexXml(s, d).select(
        (col("n") + 20).cast("long").as("doc_id"),
        col("xml").as("text"),
        concat(lit("http://"), col("host"), lit("/sm-index.xml")).as("url"),
        lit("").as("extra_headers"))
      // r19 (VERDICT r18 next #8 + what's-wrong #3): the root index
      // names sm-index.xml TWICE (a child reachable through two parent
      // slots — the per-level dedupe must keep the smaller discovery
      // path or every gz leaf duplicates) and names sm-0.xml.gz
      // DIRECTLY (so the k=0 leaf is first reachable at depth 1; the
      // gz index re-names it at depth 2, and the walk's CUMULATIVE
      // visited set must drop the re-discovery — the acyclic diamond
      // spanning levels ADVICE r18 flagged)
      val roots = hostNs
        .select((col("n") + 40).cast("long").as("doc_id"),
          concat(
            lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>http://site"),
            col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-index.xml</loc></sitemap>"),
            lit("<sitemap><loc>http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-index.xml</loc></sitemap>"),
            lit("<sitemap><loc>http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-0.xml.gz</loc></sitemap></sitemapindex>"))
            .as("text"),
          concat(lit("http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-root.xml")).as("url"),
          lit("").as("extra_headers"))
      val directs = Tables.documents(s, d)
        .select(col("doc_id"),
          UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("canon"))
        .filter(pmod(col("doc_id"), lit(4)) === 1)
        .withColumn("n", pmod(col("doc_id"), lit(13)))
        .groupBy(col("n"))
        .agg(array_join(
          transform(sort_array(collect_list(struct(col("doc_id"),
            concat(lit("<url><loc>"),
              regexp_replace(col("canon"), "&", "&amp;"),
              lit("</loc></url>")).as("e")))),
            x => x.getField("e")), "").as("body"))
        .select((col("n") + 60).cast("long").as("doc_id"),
          concat(lit("<?xml version=\"1.0\"?><urlset>"), col("body"),
            lit("<url><loc>http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/direct/missing</loc></url></urlset>"))
            .as("text"),
          concat(lit("http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-direct.xml")).as("url"),
          lit("").as("extra_headers"))
      graft.sources.Warc.synthesize(s,
        pages.unionByName(robots).unionByName(robotsReal)
          .unionByName(indexes).unionByName(roots).unionByName(directs), base)
      base
    })

  /** The zone's robots CAPTURES with their fetch-status channel (r19):
    * chunk-level parse (the q174 posture — every robots capture in this
    * zone is single-chunk by construction, and host 5's corrupt one
    * fails validity at this level exactly as under the exact reader)
    * with `X-Crawl-Status` / `Location` surfaced off the capture
    * record. Restricted to robots-path URLs (`/robots` substring), so
    * the relation stays host-cardinality — the deliberate scale
    * trade-off: a robots.txt that redirects to a URL OUTSIDE this
    * slice resolves as unreachable → allow-all (§2.3.1.3's fail-open),
    * which is the conservative-open reading; widening the candidate
    * relation to every capture would make the hop joins
    * corpus-cardinality for a signal that is host-cardinality by
    * nature. */
  private def zoneRobotsCaptures(s: SparkSession, dir: String): DataFrame =
    graft.sources.Warc.parseChunksWith(
        s.read.option("lineSep", graft.sources.Warc.Magic)
          .text(robotsZoneFor(s, dir)),
        Seq("X-Crawl-Status" -> "__status", "Location" -> "__location"))
      .filter(col("is_valid") && col("url").contains("/robots"))
      .select(UrlCanonical.hostOfCanon(col("url")).as("host"),
        UrlCanonical.canonicalize(col("url")).as("url_canon"),
        col("payload").as("txt"),
        expr("try_cast(__status AS BIGINT)").as("status"),
        col("__location").as("location"))

  /** RFC 9309 §2.3.1-resolved per-host robots policies over the zone
    * (r19, VERDICT r18 next #4): one row per host with a surviving
    * robots.txt capture — (host, policy, txt, status, hops); `txt` is
    * NULL unless policy = 'rules' (a poison 404/503/redirect-source
    * body structurally cannot be parsed). The capture relation is
    * checkpointed ONCE here; [[graft.text.Robots.fetchPolicies]]'s hop
    * loop checkpoints its own state. Shared by q160/q164/q165/q167 and
    * gated directly as q179. */
  private def zoneRobotsPolicies(s: SparkSession, dir: String): DataFrame = {
    val caps = graft.Checkpoints.eager(zoneRobotsCaptures(s, dir))
    graft.text.Robots.fetchPolicies(
      caps.filter(endswith(col("url_canon"), lit("/robots.txt")))
        .select(col("host"), col("url_canon")),
      caps.select(col("url_canon"), col("txt"), col("status"),
        col("location")))
  }

  /** The USABLE rule texts a policy relation yields — rules-policy
    * hosts only (4xx/unresolved hosts fall open by ABSENCE, exactly
    * like corrupt-capture host 5; 5xx hosts are handled by their
    * consumer's explicit disallow override). */
  private def rulesTexts(pol: DataFrame): DataFrame =
    pol.filter(col("policy") === "rules").select(col("host"), col("txt"))

  /** [[zoneRobotsPolicies]] plus its row count — ONE explicit count
    * over the hop loop's final checkpoint (metadata-cheap, no lineage
    * re-run), a valid `knownRows` upper bound for EVERY host-keyed
    * derivative (deny hosts, crawl delays — each emits at most one row
    * per policy host), so no consumer pays its own strategy probe
    * (VERDICT r18 wrong #2). The RULE relation's probe inside
    * allowed() stays: its cardinality is rules×agents, which this
    * count does NOT bound (and the converse bound is unsound — a
    * rule-less User-agent group can still carry a Crawl-delay). */
  private def zoneRobotsPoliciesCounted(
      s: SparkSession, dir: String): (DataFrame, Long) = {
    val pol = zoneRobotsPolicies(s, dir)
    (pol, pol.count())
  }

  /** q160: the q158 evaluation with the rules READ OUT OF THE WARC
    * ZONE instead of a fixture literal — robots captures resolved
    * through the §2.3.1 status machinery (r19): host 7's 404 fails
    * OPEN (its poison deny-all body must never parse), host 9's 503
    * fails CLOSED (allowed=false, rule='unavailable' — §2.3.1.4's
    * complete disallow), host 11's rules arrive via its 301 →
    * /robots-real.txt redirect (verdicts identical to a direct fetch),
    * host 5 stays the corrupt-capture fail-open. The oracle rebuilds
    * the EFFECTIVE rules in SQL (poison bodies excluded, host 9
    * overridden) and replays parse + §2.2.1/2.2.2 end to end. Composed
    * on the clean operator API (fetchPolicies/ruleSet/allowed), no
    * fixture-parity arithmetic in the query. */
  def q160ZoneRobotsGate(s: SparkSession, dir: String): DataFrame = {
    val (pol, nHosts) = zoneRobotsPoliciesCounted(s, dir)
    val rs = graft.text.Robots.ruleSet(rulesTexts(pol), col("host"), col("txt"))
    // spread: see q158 (r19 optimization)
    val docs = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"),
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("__c"))
      .select(col("doc_id"),
        UrlCanonical.hostOfCanon(col("__c")).as("host"),
        UrlCanonical.pathQueryOfCanon(col("__c")).as("path"))
    val deny = pol.filter(col("policy") === "disallow_all")
      .select(col("host"), lit(true).as("__deny"))
    graft.text.Robots.allowed(docs, rs, RobotsAgent)
      .join(graft.operators.AdaptiveJoin.broadcastIfSmall(deny,
        knownRows = Some(nHosts)), Seq("host"), "left")
      .select(col("doc_id"), col("host"), col("path"),
        when(col("__deny"), lit(false)).otherwise(col("allowed"))
          .as("allowed"),
        when(col("__deny"), lit("unavailable")).otherwise(col("rule"))
          .as("rule"),
        when(col("__deny"), lit("")).otherwise(col("rule_path"))
          .as("rule_path"))
  }

  val q160Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    // effective rules after §2.3.1: host 5 (corrupt) and host 7 (404)
    // contribute NO rules (default-allow falls out of the left join);
    // host 11's rules are OddRobots — the redirect target's body, which
    // equals what a direct fetch would have served; host 9 (503) is
    // overridden to the complete disallow AFTER evaluation
    s"""WITH ${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |dh AS (
       |  SELECT doc_id, ${UrlCanonical.duckHostOf("canon")} AS host,
       |    ${UrlCanonical.duckPathQueryOf("canon")} AS path
       |  FROM s4),
       |hn AS (SELECT DISTINCT doc_id % 13 AS n FROM documents),
       |rt AS (
       |  SELECT 'site' || n || '.xn--bcher-kva.example' AS host,
       |    CASE WHEN n % 2 = 0 THEN ${sqlTextLit(EvenRobots)}
       |         ELSE ${sqlTextLit(OddRobots)} END AS txt
       |  FROM hn WHERE n NOT IN (5, 7, 9)),
       |${graft.text.Robots.duckRobotsCtes("rt", "dh", RobotsAgent)}
       |SELECT doc_id, host, path,
       |  CASE WHEN host = 'site9.xn--bcher-kva.example' THEN false
       |       ELSE allowed END AS allowed,
       |  CASE WHEN host = 'site9.xn--bcher-kva.example' THEN 'unavailable'
       |       ELSE rule END AS rule,
       |  CASE WHEN host = 'site9.xn--bcher-kva.example' THEN ''
       |       ELSE rule_path END AS rule_path
       |FROM rb_out""".stripMargin
  }

  // -------------- q161 sitemap INDEX recursion over gz sitemaps (r17)
  // -------------- q162 lastmod-ordered recrawl priority (r17)

  /** Children per host in the gz sitemap fixture (child k holds the
    * docs with doc_id % SmChildren == k). */
  private val SmChildren = 3

  /** Deterministic `<lastmod>` fixture value: a W3C datetime whose
    * DATE component is 2025-01-01 + (doc_id·7 mod 365). Three forms,
    * all sitemaps.org-legal or deliberately broken: plain date (the
    * common case), full ISO 8601 datetime (doc_id%5==0 — the parse
    * must take the date component), and junk (`unknown`, doc_id%11==0
    * — must parse NULL and rank FIRST in staleness order: unknown age
    * is assumed stale). */
  private def lastmodCol: Column = {
    val day = date_format(
      date_add(to_date(lit("2025-01-01")),
        pmod(col("doc_id") * 7, lit(365)).cast("int")), "yyyy-MM-dd")
    when(pmod(col("doc_id"), lit(11)) === 0, lit("unknown"))
      .when(pmod(col("doc_id"), lit(5)) === 0,
        concat(day, lit("T08:30:00+00:00")))
      .otherwise(day)
  }

  private val lastmodSql: String =
    """CASE WHEN doc_id % 11 = 0 THEN 'unknown'
      |     WHEN doc_id % 5 = 0
      |     THEN strftime(DATE '2025-01-01' + CAST((doc_id * 7) % 365 AS INTEGER), '%Y-%m-%d') || 'T08:30:00+00:00'
      |     ELSE strftime(DATE '2025-01-01' + CAST((doc_id * 7) % 365 AS INTEGER), '%Y-%m-%d')
      |END""".stripMargin.replace("\n", " ")

  /** Deterministic `<changefreq>`/`<priority>` fixture elements (r18):
    * the enumerated values, a case-variant INVALID one (must parse
    * NULL), an out-of-range priority (must parse NULL), and absences. */
  private def changefreqCol: Column = {
    val m = pmod(col("doc_id"), lit(5))
    when(m === 0, lit("<changefreq>daily</changefreq>"))
      .when(m === 1, lit("<changefreq>weekly</changefreq>"))
      .when(m === 2, lit("<changefreq>monthly</changefreq>"))
      .when(m === 4, lit("<changefreq>Fortnightly</changefreq>"))
      .otherwise(lit(""))
  }
  private val changefreqSql: String =
    """CASE WHEN doc_id % 5 = 0 THEN '<changefreq>daily</changefreq>'
      |     WHEN doc_id % 5 = 1 THEN '<changefreq>weekly</changefreq>'
      |     WHEN doc_id % 5 = 2 THEN '<changefreq>monthly</changefreq>'
      |     WHEN doc_id % 5 = 4 THEN '<changefreq>Fortnightly</changefreq>'
      |     ELSE '' END""".stripMargin.replace("\n", " ")
  private def priorityCol: Column = {
    val m = pmod(col("doc_id"), lit(6))
    when(m === 0, lit("<priority>1.0</priority>"))
      .when(m === 1, lit("<priority>0.8</priority>"))
      .when(m === 2, lit("<priority>0.5</priority>"))
      .when(m === 3, lit("<priority>0.1</priority>"))
      .when(m === 5, lit("<priority>2.5</priority>"))
      .otherwise(lit(""))
  }
  private val prioritySql: String =
    """CASE WHEN doc_id % 6 = 0 THEN '<priority>1.0</priority>'
      |     WHEN doc_id % 6 = 1 THEN '<priority>0.8</priority>'
      |     WHEN doc_id % 6 = 2 THEN '<priority>0.5</priority>'
      |     WHEN doc_id % 6 = 3 THEN '<priority>0.1</priority>'
      |     WHEN doc_id % 6 = 5 THEN '<priority>2.5</priority>'
      |     ELSE '' END""".stripMargin.replace("\n", " ")

  private val sitemapZones =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The GZIPPED sitemap zone (VERDICT r16 next #3): one `.xml.gz`
    * FILE per host whose gzip MEMBERS are the host's child sitemaps in
    * k order — the member-concatenated layout WarcGz's walker splits
    * inside (real sitemap providers gzip per the protocol's 50k-URL /
    * 50 MB cap and publish an INDEX file naming the children). Child k
    * carries host n's docs with doc_id%3==k as `<url><loc>…</loc>
    * <lastmod>…</lastmod></url>` entries in doc_id order, canonical
    * URLs XML-escaped (the q159 escaping). Written distributedly
    * (repartition by host, one task writes whole files — the
    * Warc.synthesize seam). */
  private[queries] def sitemapZoneFor(s: SparkSession, dir: String): String =
    sitemapZones.computeIfAbsent(dir, { d =>
      val base = graft.TempArtifacts.dir("graft_sitemap_gz")
      val docs = Tables.documents(s, d).select(col("doc_id"),
        UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("canon"))
      val entries = docs.select(
        pmod(col("doc_id"), lit(13)).as("n"),
        pmod(col("doc_id"), lit(SmChildren)).as("k"),
        col("doc_id"),
        concat(lit("<url><loc> "),
          regexp_replace(col("canon"), "&", "&amp;"),
          lit(" </loc><lastmod>"), lastmodCol,
          lit("</lastmod>"), changefreqCol, priorityCol,
          lit("</url>")).as("e"))
      val bodies = entries.groupBy(col("n"), col("k"))
        .agg(array_join(
          transform(sort_array(collect_list(struct(col("doc_id"), col("e")))),
            x => x.getField("e")), "").as("body"))
        .select(col("n").cast("long").as("n"), col("k").cast("long").as("k"),
          concat(lit("<?xml version=\"1.0\"?><urlset>"), col("body"),
            lit("</urlset>")).as("xml"))
      val hconf = s.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration))
      bodies.repartition(13, col("n")).sortWithinPartitions(col("n"), col("k"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          var curN = -1L
          var raw: org.apache.hadoop.fs.FSDataOutputStream = null
          def closeFile(): Unit = if (raw != null) { raw.close(); raw = null }
          try {
            it.foreach { r =>
              val n = r.getLong(0)
              if (n != curN) {
                closeFile()
                val p = new org.apache.hadoop.fs.Path(s"$base/site$n.xml.gz")
                raw = p.getFileSystem(hconf.value.value).create(p, true)
                curN = n
              }
              // per-member gzip behind a close-shield (the
              // Warc.synthesize discipline: member stream closes to
              // free its Deflater, file stream stays open)
              val fileStream = raw
              val shield = new java.io.FilterOutputStream(fileStream) {
                override def write(b: Int): Unit = fileStream.write(b)
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  fileStream.write(b, off, len)
                override def close(): Unit = flush()
              }
              val gz = new java.util.zip.GZIPOutputStream(shield)
              gz.write(r.getString(2).getBytes("UTF-8"))
              gz.close()
            }
          } finally closeFile()
        }
      base
    })

  /** The recursion: per-host INDEX xml (children listed k-DESCENDING,
    * so index document order ≠ numeric member order — the join must
    * really resolve child URLs to members, not zip sequences), child
    * refs extracted with the SAME `<loc>` machinery (sitemapindex and
    * urlset share the element name), gz members decoded through
    * WarcGz.memberIndex + readMemberTexts, child resolved by
    * (host n, member ordinal k parsed from the child URL). Output:
    * (host, n, sm_idx = index document order, k, cxml). */
  /** The per-host sitemap INDEX xml (children k-DESCENDING), built
    * from `documents` — shared by the synthesized-relation path
    * (childSitemaps) and the robots ZONE's index captures (q167). */
  private def sitemapIndexXml(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        pmod(col("doc_id"), lit(13)).as("n"),
        pmod(col("doc_id"), lit(SmChildren)).as("k")).distinct()
      .groupBy(col("n"))
      .agg(array_join(
        transform(sort_array(collect_list(struct((-col("k")).as("ord"),
          concat(lit("<sitemap><loc>http://site"), col("n").cast("string"),
            lit(".xn--bcher-kva.example/sm-"), col("k").cast("string"),
            lit(".xml.gz</loc></sitemap>")).as("e")))),
          x => x.getField("e")), "").as("body"))
      .select(col("n").cast("long").as("n"),
        concat(lit("site"), col("n").cast("string"),
          lit(".xn--bcher-kva.example")).as("host"),
        concat(lit("<?xml version=\"1.0\"?><sitemapindex>"), col("body"),
          lit("</sitemapindex>")).as("xml"))

  /** Resolve index child refs (from `indexDf (host, xml, …)`) to the
    * gz zone's members: (n, k, host, sm_idx, cxml). */
  private def resolveChildren(s: SparkSession, dir: String,
                              indexDf: DataFrame): DataFrame = {
    val zone = sitemapZoneFor(s, dir)
    val refs = graft.text.Sitemaps.locs(indexDf, col("xml"))
      .select(
        regexp_extract(col("host"), "^site(\\d+)", 1).cast("long").as("n"),
        col("host"), col("loc_idx").as("sm_idx"),
        regexp_extract(col("loc_canon"), "sm-(\\d+)\\.xml\\.gz$", 1)
          .cast("long").as("k"))
    val members = graft.sources.WarcGz.readMemberTexts(s,
      graft.sources.WarcGz.memberIndex(s, zone))
      .filter(col("ok"))
      .select(regexp_extract(col("file"), "site(\\d+)\\.xml\\.gz$", 1)
          .cast("long").as("n"),
        col("member_idx").as("k"), col("text").as("cxml"))
    refs.join(members, Seq("n", "k"))
  }

  private def childSitemaps(s: SparkSession, dir: String): DataFrame =
    resolveChildren(s, dir, sitemapIndexXml(s, dir).select(col("host"), col("xml")))

  /** q161: one-level sitemap-INDEX recursion over `.xml.gz` children —
    * index → child sitemaps → `<loc>` frontier with corpus membership,
    * document order preserved at BOTH levels (sm_idx within the index,
    * loc_idx within each child). The oracle rebuilds index and child
    * bodies from `documents` and replays the identical extraction —
    * the gz layer (member walk, ordinal resolution, text decode) is
    * engine-side only, so a member decoded wrong, resolved to the
    * wrong child, or dropped hash-mismatches. */
  def q161SitemapRecursion(s: SparkSession, dir: String): DataFrame = {
    val children = childSitemaps(s, dir)
    val locs = graft.text.Sitemaps.locs(children, col("cxml")).drop("cxml")
    // spread: see q158 (r19 optimization)
    val corpus = Tables.spread(s, Tables.documents(s, dir))
      .select(UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("loc_canon"))
      .distinct().withColumn("__in", lit(true))
    locs.join(corpus, Seq("loc_canon"), "left")
      .select(col("host"), col("sm_idx"), col("k"), col("loc_idx"),
        col("loc_canon"), coalesce(col("__in"), lit(false)).as("in_corpus"))
  }

  /** The shared oracle CTE chain: canon docs → child bodies → index →
    * child refs (k DESC document order) → per-child entry relation
    * `sce (n, host, sm_idx, k, u)` where `u` is one raw `<url>`
    * fragment with its `loc_idx`. */
  private def sitemapCtes: String = {
    s"""smd AS (
       |  SELECT doc_id, canon, doc_id % 13 AS n, doc_id % $SmChildren AS k,
       |    $lastmodSql AS lm, $changefreqSql AS cf, $prioritySql AS py
       |  FROM s4),
       |smb AS (
       |  SELECT n, k,
       |    '<?xml version="1.0"?><urlset>' ||
       |    string_agg('<url><loc> ' || replace(canon, '&', '&amp;') ||
       |      ' </loc><lastmod>' || lm || '</lastmod>' || cf || py || '</url>', ''
       |      ORDER BY doc_id) || '</urlset>' AS cxml
       |  FROM smd GROUP BY n, k),
       |six AS (
       |  SELECT n,
       |    '<?xml version="1.0"?><sitemapindex>' ||
       |    string_agg('<sitemap><loc>http://site' || n ||
       |      '.xn--bcher-kva.example/sm-' || k || '.xml.gz</loc></sitemap>',
       |      '' ORDER BY k DESC) || '</sitemapindex>' AS xml
       |  FROM (SELECT DISTINCT n, k FROM smd) GROUP BY n),
       |sxl AS (
       |  SELECT n, unnest(range(len(l))) AS sm_idx, unnest(l) AS rawloc
       |  FROM (SELECT n, ${graft.text.Sitemaps.duckLocs("xml")} AS l FROM six)),
       |sxr AS (
       |  SELECT n, 'site' || n || '.xn--bcher-kva.example' AS host, sm_idx,
       |    CAST(regexp_extract(rawloc, 'sm-(\\d+)\\.xml\\.gz$$', 1) AS BIGINT) AS k
       |  FROM sxl),
       |sce AS (
       |  SELECT n, host, sm_idx, k,
       |    unnest(range(len(ul))) AS loc_idx, unnest(ul) AS u
       |  FROM (
       |    SELECT x.n, x.host, x.sm_idx, x.k,
       |      ${graft.text.Sitemaps.duckUrlEntries("b.cxml")} AS ul
       |    FROM sxr x JOIN smb b USING (n, k)))""".stripMargin
  }

  val q161Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${graft.text.HtmlExtract.duckEntmapCte},
       |${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |$sitemapCtes,
       |sld AS (
       |  SELECT n, host, sm_idx, k, loc_idx,
       |    ${graft.text.HtmlExtract.duckEntities(
              graft.text.Sitemaps.duckEntryLoc("u"))} AS url
       |  FROM sce, entmap),
       |${UrlCanonical.duckCanonCtes("sld", "host, sm_idx, k, loc_idx", idn, "sc")},
       |cc AS (SELECT DISTINCT canon FROM s4)
       |SELECT sc4.host, sc4.sm_idx, sc4.k, sc4.loc_idx,
       |  sc4.canon AS loc_canon, (cc.canon IS NOT NULL) AS in_corpus
       |FROM sc4 LEFT JOIN cc ON sc4.canon = cc.canon""".stripMargin
  }

  /** q162: the RECRAWL-PRIORITY frontier (VERDICT r16 next #4) — every
    * child-sitemap entry with its `<lastmod>`, ranked per host by
    * staleness: NULL-parsed lastmods FIRST (unknown age = assume
    * stale), then oldest date first. The date component parses from
    * all three fixture forms (plain W3C date, full ISO datetime,
    * junk→NULL); ties break on (loc_canon, k, loc_idx) — (k, loc_idx)
    * is unique per host, so the rank is deterministic on both engines
    * (the oracle window-tie discipline). */
  def q162RecrawlPriority(s: SparkSession, dir: String): DataFrame = {
    val entries = graft.text.Sitemaps.urlEntries(
      childSitemaps(s, dir), col("cxml")).drop("cxml")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
      .orderBy(col("lastmod_day").asc_nulls_first, col("loc_canon"),
        col("k"), col("url_idx"))
    entries
      .withColumn("stale_rank", row_number().over(w).cast("long"))
      .select(col("host"), col("k"), col("url_idx").as("entry_idx"),
        col("loc_canon"), col("lastmod_raw"),
        date_format(col("lastmod_day"), "yyyy-MM-dd").as("lastmod_day"),
        col("changefreq"), col("priority_milli"),
        col("stale_rank"))
  }

  val q162Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${graft.text.HtmlExtract.duckEntmapCte},
       |${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |$sitemapCtes,
       |sle AS (
       |  SELECT n, host, sm_idx, k, loc_idx,
       |    ${graft.text.HtmlExtract.duckEntities(
              graft.text.Sitemaps.duckEntryLoc("u"))} AS url,
       |    ${graft.text.Sitemaps.duckEntryLastmod("u")} AS lastmod_raw,
       |    ${graft.text.Sitemaps.duckEntryChangefreq("u")} AS changefreq,
       |    ${graft.text.Sitemaps.duckEntryPriorityMilli("u")} AS priority_milli
       |  FROM sce, entmap),
       |${UrlCanonical.duckCanonCtes("sle",
          "host, sm_idx, k, loc_idx, lastmod_raw, changefreq, priority_milli",
          idn, "sc")},
       |sp AS (
       |  SELECT host, k, loc_idx, canon AS loc_canon, lastmod_raw,
       |    changefreq, priority_milli,
       |    ${graft.text.Sitemaps.duckLastmodDay("lastmod_raw")} AS d
       |  FROM sc4)
       |SELECT host, k, loc_idx AS entry_idx, loc_canon, lastmod_raw,
       |  strftime(d, '%Y-%m-%d') AS lastmod_day, changefreq, priority_milli,
       |  CAST(row_number() OVER (PARTITION BY host
       |    ORDER BY d ASC NULLS FIRST, loc_canon, k, loc_idx) AS BIGINT)
       |    AS stale_rank
       |FROM sp""".stripMargin
  }

  // -------------- q164 robots 'Sitemap:' discovery (r17, beyond plan)

  /** q164: sitemap DISCOVERY from the zone's robots captures — the
    * `Sitemap:` directive is how origins declare their sitemaps
    * (sitemaps.org discovery; group-independent per RFC 9309), and a
    * real frontier build starts exactly here: robots.txt → sitemap
    * URLs → index recursion (q161) → locs. One row per directive in
    * document order, the URL canonicalized into the engine's key space
    * (the fixture's second, SHOUTING-case default-port variant must
    * collapse onto the same host, path case kept). Host 5's corrupt
    * capture contributes nothing. */
  def q164RobotsSitemaps(s: SparkSession, dir: String): DataFrame = {
    // r19: discovery reads only §2.3.1 rules-policy texts — host 7's
    // 404 and host 9's 503 POISON Sitemap lines must never surface;
    // host 11's lines arrive through its redirect unchanged
    val robots = rulesTexts(zoneRobotsPolicies(s, dir))
    graft.text.Robots.sitemaps(robots, col("host"), col("txt"))
      .withColumn("sitemap_canon",
        UrlCanonical.canonicalize(col("sitemap_url")))
  }

  val q164Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    // hosts 5 (corrupt), 7 (404), 9 (503) discover nothing — their
    // poison Sitemap lines must never surface; host 11 discovers
    // through its redirect target, whose lines equal the direct shape
    s"""WITH hn AS (SELECT DISTINCT doc_id % 13 AS n FROM documents),
       |rt AS (
       |  SELECT 'site' || n || '.xn--bcher-kva.example' AS host,
       |    (CASE WHEN n % 2 = 0 THEN ${sqlTextLit(EvenRobots)}
       |          ELSE ${sqlTextLit(OddRobots)} END) ||
       |    chr(10) || 'Sitemap: http://site' || n ||
       |    '.xn--bcher-kva.example/sm-root.xml' ||
       |    chr(10) || 'Sitemap: http://site' || n ||
       |    '.xn--bcher-kva.example/sm-direct.xml' ||
       |    chr(10) || 'Sitemap: HTTP://SITE' || n ||
       |    '.XN--BCHER-KVA.EXAMPLE:80/Dup.xml' AS txt
       |  FROM hn WHERE n NOT IN (5, 7, 9)),
       |${graft.text.Robots.duckSitemapsCtes("rt")},
       |smu AS (SELECT host, sm_idx, sitemap_url,
       |          sitemap_url AS url FROM rb_sm),
       |${UrlCanonical.duckCanonCtes("smu", "host, sm_idx, sitemap_url", idn, "sm")}
       |SELECT host, sm_idx, sitemap_url, canon AS sitemap_canon FROM sm4""".stripMargin
  }

  // ------------- q165 robots-gated crawl schedule (r17, beyond plan)

  /** Default per-host politeness rate: entries per crawl slot when the
    * host declares no usable Crawl-delay. */
  private val CrawlRate = 4L

  /** The scheduling window a Crawl-delay divides into: a host declaring
    * `Crawl-delay: d` gets max(1, 60 div d) fetches per slot. */
  private val ScheduleWindowSec = 60L

  /** q165: the COMPOSED crawl schedule — the q162 staleness frontier
    * gated by the ZONE-sourced robots rules (q160's captures; host 5
    * fails open) and bucketed into per-host politeness SLOTS
    * (slot = (crawl_rank − 1) div rate). The rate comes from the
    * host's OWN `Crawl-delay` when its selected group declares a
    * usable one (r18, VERDICT r17 next #3:
    * rate = max(1, [[ScheduleWindowSec]] div delay) — the even
    * fixture's graftbot group says 7 → 8/slot, and the `*` group's
    * `Crawl-delay: 2` must NOT leak into it), else [[CrawlRate]] (odd
    * hosts, whose only delay value is non-integer junk). This is the
    * chain a real recrawl scheduler runs: sitemap entries → lastmod
    * staleness → robots compliance → rate-limited order. Disallowed
    * entries drop BEFORE ranking, so ranks are dense within the
    * crawlable set; all divisions are non-negative (truncate ≡ floor
    * on both engines).
    *
    * r19 status semantics: host 9 (503) is COMPLETELY disallowed — its
    * entries anti-join out before the rules gate; host 7 (404) fails
    * open and schedules whole at the default rate; host 11's delay
    * (none — OddRobots junk only) comes from its redirect target. The
    * delays join threads the policy relation's one count as its bound
    * (VERDICT r18 wrong #2: |delays| ≤ policy hosts by construction —
    * no second strategy probe; PlanAuditSpec asserts exactly one). */
  def q165CrawlSchedule(s: SparkSession, dir: String): DataFrame = {
    val entries = graft.text.Sitemaps.urlEntries(
      childSitemaps(s, dir), col("cxml")).drop("cxml")
      .withColumn("entry_key",
        concat(col("host"), lit("|"), col("k").cast("string"),
          lit("|"), col("url_idx").cast("string")))
      .withColumn("path", UrlCanonical.pathQueryOfCanon(col("loc_canon")))
    val (pol, nHosts) = zoneRobotsPoliciesCounted(s, dir)
    val robots = rulesTexts(pol)
    val rs = graft.text.Robots.ruleSet(robots, col("host"), col("txt"))
    val deny = pol.filter(col("policy") === "disallow_all")
      .select(col("host"))
    val gated = graft.text.Robots.allowed(
        entries.join(graft.operators.AdaptiveJoin.broadcastIfSmall(deny,
          knownRows = Some(nHosts)), Seq("host"), "left_anti"),
        rs, RobotsAgent, keyCol = "entry_key")
      .filter(col("allowed"))
    // host-cardinality, zone-derived lineage — same checkpoint-then-
    // adaptive discipline as allowed()'s rule relation
    val delays = graft.Checkpoints.eager(
      graft.text.Robots.crawlDelays(robots, col("host"), col("txt"),
        RobotsAgent).withColumnRenamed("delay_secs", "crawl_delay"))
    // staleness first, then the origin's own <priority> (missing =
    // the protocol's 0.5 default = 500 milli — r18, VERDICT r17 next
    // #7's "scheduler use"), then the deterministic tiebreaks
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
      .orderBy(col("lastmod_day").asc_nulls_first,
        coalesce(col("priority_milli"), lit(500L)).desc,
        col("loc_canon"), col("k"), col("url_idx"))
    gated
      // knownRows: at most one delay row per policy host — the bound
      // rides the ONE count the policy relation already paid for
      .join(graft.operators.AdaptiveJoin.broadcastIfSmall(delays,
        knownRows = Some(nHosts)), Seq("host"), "left")
      // greatest() SKIPS nulls on both engines, so the absent-delay
      // default must be an explicit CASE, not greatest-with-null
      .withColumn("rate", when(col("crawl_delay").isNull, lit(CrawlRate))
        .otherwise(greatest(lit(1L),
          expr(s"$ScheduleWindowSec div crawl_delay"))))
      .withColumn("crawl_rank", row_number().over(w).cast("long"))
      .select(col("host"), col("k"), col("url_idx").as("entry_idx"),
        col("loc_canon"),
        date_format(col("lastmod_day"), "yyyy-MM-dd").as("lastmod_day"),
        col("priority_milli"), col("rule"), col("crawl_delay"),
        col("rate"), col("crawl_rank"),
        expr("(crawl_rank - 1) div rate").as("slot"))
  }

  val q165Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    s"""WITH ${graft.text.HtmlExtract.duckEntmapCte},
       |${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |$sitemapCtes,
       |sle AS (
       |  SELECT n, host, sm_idx, k, loc_idx,
       |    ${graft.text.HtmlExtract.duckEntities(
              graft.text.Sitemaps.duckEntryLoc("u"))} AS url,
       |    ${graft.text.Sitemaps.duckEntryLastmod("u")} AS lastmod_raw,
       |    ${graft.text.Sitemaps.duckEntryPriorityMilli("u")} AS priority_milli
       |  FROM sce, entmap),
       |${UrlCanonical.duckCanonCtes("sle",
          "host, sm_idx, k, loc_idx, lastmod_raw, priority_milli", idn, "sc")},
       |fd AS (
       |  SELECT host || '|' || k || '|' || loc_idx AS entry_key,
       |    host, k, loc_idx, canon AS loc_canon, lastmod_raw, priority_milli,
       |    ${graft.text.Sitemaps.duckLastmodDay("lastmod_raw")} AS d,
       |    ${UrlCanonical.duckPathQueryOf("canon")} AS path
       |  FROM sc4),
       |rt AS (
       |  SELECT 'site' || n || '.xn--bcher-kva.example' AS host,
       |    CASE WHEN n % 2 = 0 THEN ${sqlTextLit(EvenRobots)}
       |         ELSE ${sqlTextLit(OddRobots)} END AS txt
       |  FROM (SELECT DISTINCT doc_id % 13 AS n FROM documents)
       |  WHERE n NOT IN (5, 7, 9)),
       |${graft.text.Robots.duckRobotsCtes("rt", "fd", RobotsAgent, "entry_key")},
       |${graft.text.Robots.duckCrawlDelayCtes("rt", RobotsAgent)},
       |sched AS (
       |  SELECT f.host, f.k, f.loc_idx, f.loc_canon, f.d, f.priority_milli,
       |    o.rule, cd.delay_secs AS crawl_delay,
       |    CAST(CASE WHEN cd.delay_secs IS NULL THEN $CrawlRate
       |         ELSE greatest(1, $ScheduleWindowSec // cd.delay_secs)
       |         END AS BIGINT) AS rate,
       |    CAST(row_number() OVER (PARTITION BY f.host
       |      ORDER BY f.d ASC NULLS FIRST,
       |        coalesce(f.priority_milli, 500) DESC,
       |        f.loc_canon, f.k, f.loc_idx)
       |      AS BIGINT) AS crawl_rank
       |  FROM fd f JOIN rb_out o USING (entry_key)
       |  LEFT JOIN rb_cd cd ON f.host = cd.host
       |  WHERE o.allowed
       |    AND f.host <> 'site9.xn--bcher-kva.example')
       |SELECT host, k, loc_idx AS entry_idx, loc_canon,
       |  strftime(d, '%Y-%m-%d') AS lastmod_day, priority_milli, rule,
       |  crawl_delay, rate, crawl_rank, (crawl_rank - 1) // rate AS slot
       |FROM sched""".stripMargin
  }

  // --------- q167 end-to-end ZONE-sourced frontier (r17, beyond plan)

  /** q167 (r18 upgrade — VERDICT r17 next #4/#5): the frontier chain
    * with EVERY link zone-sourced AND generically routed — robots
    * captures → `Sitemap:` discovery (q164) → a BOUNDED-DEPTH tree
    * walk ([[graft.text.SitemapTree]]) that fetches each discovered
    * URL out of the zone (plain captures by canonical URL; `.xml.gz`
    * refs through the gz member machinery) and routes by ROOT ELEMENT,
    * never by URL shape: the root index recurses into the gz index
    * (index→index nesting), the gz index's children are urlset leaves,
    * the directly-discovered plain sitemap is a leaf at depth 0, and
    * the dead `Dup.xml` discovery drops unfetched. Output keys carry
    * the DISCOVERY PATH (`sm_path`, document order at every level) and
    * depth, so ordering is preserved across levels. Host 5 drops at
    * the FIRST link (its robots capture is corrupt, so nothing of its
    * — valid, present — sitemap tree is ever discovered); the oracle
    * mirrors with a static replay of the known tree over non-corrupt
    * hosts.
    *
    * r19 tree shape (VERDICT r18 next #8): the root index names the gz
    * index TWICE (per-level dedupe keeps the smaller slot's path) and
    * names sm-0.xml.gz directly — so the k=0 leaf emits ONCE, at depth
    * 1 under path 00000/00002, and the gz index's own sm-0 entry at
    * depth 2 must be dropped by the walk's cumulative visited set (the
    * cross-level diamond). A walk without either dedupe emits
    * duplicate leaves and hash-mismatches. */
  def q167ZoneFrontier(s: SparkSession, dir: String): DataFrame = {
    val zone = robotsZoneFor(s, dir)
    // r19: discovery honors §2.3.1 — hosts 7 (404) and 9 (503) have no
    // usable robots text, so their (present, valid) sitemap trees are
    // never entered; host 11 seeds from its redirect target's text
    val seeds = graft.text.Robots.sitemaps(
        rulesTexts(zoneRobotsPolicies(s, dir)), col("host"), col("txt"))
      .select(col("host"),
        UrlCanonical.canonicalize(col("sitemap_url")).as("sm_canon"),
        graft.text.SitemapTree.pathComponent(col("sm_idx")).as("sm_path"))
    // r19 (VERDICT r18 what's-wrong #1): both fetch sources are
    // eagerly CHECKPOINTED once, so each of the walk's maxDepth+1
    // fetch-joins reads the materialized relation instead of re-running
    // the whole-zone exact read / gz member inflate per level (r18 paid
    // up to 4 zone scans + 4 inflates where 1 of each suffices —
    // measured +2.8 s at sf0.1). The capture checkpoint is pre-filtered
    // to ROOT-ELEMENT-credible payloads (the same <urlset|sitemapindex>
    // match the router applies) — output-equivalent by construction
    // (a fetched document matching neither root element routes nowhere:
    // not a leaf, not a recursion), and at 100 TB it is the difference
    // between checkpointing the sitemap slice and copying the corpus.
    // PlanAuditSpec asserts the returned plan reads NO zone source.
    val captures = graft.Checkpoints.eager(
      graft.sources.Warc.readExactClean(s, zone)
        .filter(regexp_extract(col("payload"),
          "(?is)<\\s*(urlset|sitemapindex)", 1) =!= "")
        .select(UrlCanonical.canonicalize(col("url")).as("sm_canon"),
          col("payload").as("xml")))
    val gzZone = sitemapZoneFor(s, dir)
    val members = graft.Checkpoints.eager(
      graft.sources.WarcGz.readMemberTexts(s,
          graft.sources.WarcGz.memberIndex(s, gzZone))
        .filter(col("ok"))
        .select(regexp_extract(col("file"), "site(\\d+)\\.xml\\.gz$", 1)
            .cast("long").as("n"),
          col("member_idx").as("k"), col("text").as("gxml")))
    def fetch(frontier: DataFrame): DataFrame = {
      val plain = frontier.join(captures, Seq("sm_canon"))
        .select(col("host"), col("sm_canon"), col("sm_path"), col("xml"))
      // .xml.gz refs resolve by the zone's published ordinal layout
      // (child URL sm-K ↔ member ordinal K of the host's file — the
      // q161 convention)
      val gz = frontier.filter(endswith(col("sm_canon"), lit(".xml.gz")))
        .select(
          regexp_extract(col("host"), "^site(\\d+)", 1).cast("long").as("n"),
          regexp_extract(col("sm_canon"), "sm-(\\d+)\\.xml\\.gz$", 1)
            .cast("long").as("k"),
          col("host"), col("sm_canon"), col("sm_path"))
        .join(members, Seq("n", "k"))
        .select(col("host"), col("sm_canon"), col("sm_path"),
          col("gxml").as("xml"))
      plain.unionByName(gz)
    }
    val leaves = graft.text.SitemapTree.walk(seeds, fetch, maxDepth = 3)
    val locs = graft.text.Sitemaps.locs(leaves, col("xml")).drop("xml")
    // spread: see q158 (r19 optimization)
    val corpus = Tables.spread(s, Tables.documents(s, dir))
      .select(UrlCanonical.canonicalize(CorpusOps.messyUrlCol).as("loc_canon"))
      .distinct().withColumn("__in", lit(true))
    locs.join(corpus, Seq("loc_canon"), "left")
      .select(col("host"), col("sm_path"), col("depth"), col("loc_idx"),
        col("loc_canon"), coalesce(col("__in"), lit(false)).as("in_corpus"))
  }

  val q167Sql: String = {
    val idn = Seq("bücher" -> "xn--bcher-kva")
    // static replay of the known tree over non-corrupt hosts: the k=0
    // gz leaf is first reachable DIRECTLY from the root's third slot —
    // depth 1, path root(00000)/00002 — and its depth-2 re-discovery
    // through the gz index is dropped by the cumulative visited set;
    // the k≠0 gz leaves sit at depth 2 under path
    // root(00000)/index(00000 — the SMALLER of the duplicate slots
    // 00000/00001)/childJ (J = the index's k-DESC document order,
    // sitemapCtes' sm_idx); the direct urlset is a depth-0 leaf at
    // path 00001 (the second Sitemap: directive); the Dup discovery
    // (00002) fetches nothing
    s"""WITH ${graft.text.HtmlExtract.duckEntmapCte},
       |${CorpusOps.messyUrlMkCte},
       |${UrlCanonical.duckCanonCtes("mk", "doc_id", idn, "s")},
       |$sitemapCtes,
       |sld AS (
       |  SELECT n, host, sm_idx, k, loc_idx,
       |    ${graft.text.HtmlExtract.duckEntities(
              graft.text.Sitemaps.duckEntryLoc("u"))} AS url
       |  FROM sce, entmap),
       |${UrlCanonical.duckCanonCtes("sld", "host, sm_idx, k, loc_idx", idn, "sc")},
       |cc AS (SELECT DISTINCT canon FROM s4),
       |gleaf AS (
       |  SELECT host,
       |    CASE WHEN k = 0 THEN '00000/00002'
       |         ELSE '00000/00000/' || lpad(CAST(sm_idx AS VARCHAR), 5, '0')
       |    END AS sm_path,
       |    CAST(CASE WHEN k = 0 THEN 1 ELSE 2 END AS BIGINT) AS depth,
       |    loc_idx, canon AS loc_canon
       |  FROM sc4
       |  WHERE CAST(regexp_extract(host, 'site(\\d+)', 1) AS BIGINT)
       |        NOT IN (5, 7, 9)),
       |dd AS (
       |  SELECT doc_id, canon, doc_id % 13 AS n FROM s4 WHERE doc_id % 4 = 1),
       |dro AS (
       |  SELECT n, 'site' || n || '.xn--bcher-kva.example' AS host,
       |    CAST(row_number() OVER (PARTITION BY n ORDER BY doc_id) - 1
       |      AS BIGINT) AS loc_idx,
       |    canon AS loc_canon
       |  FROM dd),
       |dmiss AS (
       |  SELECT n, 'site' || n || '.xn--bcher-kva.example' AS host,
       |    CAST(count(*) AS BIGINT) AS loc_idx,
       |    'http://site' || n || '.xn--bcher-kva.example/direct/missing'
       |      AS loc_canon
       |  FROM dd GROUP BY n),
       |dleaf AS (
       |  SELECT host, '00001' AS sm_path, CAST(0 AS BIGINT) AS depth,
       |    loc_idx, loc_canon
       |  FROM (SELECT * FROM dro UNION ALL SELECT * FROM dmiss)
       |  WHERE n NOT IN (5, 7, 9)),
       |lf AS (SELECT * FROM gleaf UNION ALL SELECT * FROM dleaf)
       |SELECT lf.host, lf.sm_path, lf.depth, lf.loc_idx, lf.loc_canon,
       |  (cc.canon IS NOT NULL) AS in_corpus
       |FROM lf LEFT JOIN cc ON lf.loc_canon = cc.canon""".stripMargin
  }

  // ------------- q179 robots fetch-status resolution (r19, next #4)

  /** q179: the §2.3.1 policy relation ITSELF, gate-hashed — one row per
    * host with a surviving robots.txt capture: its FINAL fetch status
    * (null = the archiver recorded no status channel = 200-class),
    * redirect hops followed, and the assumed policy. Host 5 is absent
    * (corrupt capture — the fail-open is its consumers' left-join
    * default, not a policy row); host 7 reads 404/allow_all; host 9
    * 503/disallow_all; host 11 finishes 200/rules after ONE hop through
    * its relative-Location redirect; every other host is a statusless
    * rules row at hop 0. The oracle is a static replay of the known
    * status layout (the q167 oracle's honesty posture); RobotsSpec
    * covers the machinery's loop/budget/missing-target classes the
    * fixture doesn't reach. */
  def q179RobotsFetchStatus(s: SparkSession, dir: String): DataFrame =
    zoneRobotsPolicies(s, dir)
      .select(col("host"), col("status"), col("hops"), col("policy"))

  val q179Sql: String =
    s"""WITH hn AS (SELECT DISTINCT doc_id % 13 AS n FROM documents)
       |SELECT 'site' || n || '.xn--bcher-kva.example' AS host,
       |  CAST(CASE WHEN n = 7 THEN 404 WHEN n = 9 THEN 503
       |       WHEN n = 11 THEN 200 END AS BIGINT) AS status,
       |  CAST(CASE WHEN n = 11 THEN 1 ELSE 0 END AS BIGINT) AS hops,
       |  CASE WHEN n = 7 THEN 'allow_all' WHEN n = 9 THEN 'disallow_all'
       |       ELSE 'rules' END AS policy
       |FROM hn WHERE n <> 5""".stripMargin

  val queries: Map[String, Q] = Map(
    "q182_hreflang_alternates" -> q182HreflangAlternates,
    "q181_redirect_aware_edges" -> q181RedirectAwareEdges,
    "q178_anchor_terms" -> q178AnchorTerms,
    "q179_robots_fetch_status" -> q179RobotsFetchStatus,
    "q167_zone_frontier" -> q167ZoneFrontier,
    "q165_crawl_schedule" -> q165CrawlSchedule,
    "q164_robots_sitemaps" -> q164RobotsSitemaps,
    "q162_recrawl_priority" -> q162RecrawlPriority,
    "q161_sitemap_recursion" -> q161SitemapRecursion,
    "q160_zone_robots" -> q160ZoneRobotsGate,
    "q159_sitemap_frontier" -> q159SitemapFrontier,
    "q150_outlinks" -> q150Outlinks,
    "q151_host_rank" -> q151HostRank,
    "q155_anchor_text" -> q155AnchorText,
    "q156_rank_quota" -> q156RankQuota,
    "q158_robots_gate" -> q158RobotsGate,
    "q168_quota_kept" -> q168QuotaKept,
    "q169_nofollow_edges" -> q169NofollowEdges,
    "q171_followed_edges" -> q171FollowedEdges,
    "q172_canonical_link" -> q172CanonicalLink,
    "q173_followed_rank" -> q173FollowedRank,
  )

  val oracles: Map[String, String] = Map(
    "q182_hreflang_alternates" -> q182Sql,
    "q181_redirect_aware_edges" -> q181Sql,
    "q178_anchor_terms" -> q178Sql,
    "q179_robots_fetch_status" -> q179Sql,
    "q173_followed_rank" -> q173Sql,
    "q168_quota_kept" -> q168Sql,
    "q169_nofollow_edges" -> q169Sql,
    "q171_followed_edges" -> q171Sql,
    "q172_canonical_link" -> q172Sql,
    "q167_zone_frontier" -> q167Sql,
    "q165_crawl_schedule" -> q165Sql,
    "q164_robots_sitemaps" -> q164Sql,
    "q162_recrawl_priority" -> q162Sql,
    "q161_sitemap_recursion" -> q161Sql,
    "q160_zone_robots" -> q160Sql,
    "q159_sitemap_frontier" -> q159Sql,
    "q150_outlinks" -> q150Sql,
    "q151_host_rank" -> q151Sql,
    "q155_anchor_text" -> q155Sql,
    "q156_rank_quota" -> q156Sql,
    "q158_robots_gate" -> q158Sql,
  )
}
