package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** RFC 9309 robots.txt semantics, case by case. */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private def verdicts(txt: String, agent: String,
                       paths: (Long, String)*): Map[Long, (Boolean, String)] = {
    val robots = Seq(("h.example", txt)).toDF("host", "txt")
    val docs = paths.map { case (id, p) => (id, "h.example", p) }
      .toDF("doc_id", "host", "path")
    val rs = Robots.ruleSet(robots, col("host"), col("txt"))
    Robots.allowed(docs, rs, agent)
      .select(col("doc_id"), col("allowed"), col("rule_path"))
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("longest match wins; allow beats disallow on equal length; no match allows") {
    val txt = Seq(
      "User-agent: bot",
      "Disallow: /a",
      "Allow: /a/b",
      "Allow: /c",
      "Disallow: /c").mkString("\n")
    val got = verdicts(txt, "bot",
      1L -> "/a/x", 2L -> "/a/b/x", 3L -> "/c/x", 4L -> "/free")
    assert(got(1L) == (false, "/a"), s"got ${got(1L)}")
    assert(got(2L) == (true, "/a/b"))
    assert(got(3L) == (true, "/c"), "allow wins the tie")
    assert(got(4L) == (true, ""), "no rule → allowed")
  }

  test("consecutive User-agent lines share one group; exact token beats *") {
    val txt = Seq(
      "User-agent: alpha",
      "User-agent: bot",
      "Disallow: /shared",
      "",
      "User-agent: *",
      "Disallow: /").mkString("\n")
    val got = verdicts(txt, "bot", 1L -> "/shared/x", 2L -> "/other")
    assert(got(1L) == (false, "/shared"), "second UA line of the run applies")
    assert(got(2L) == (true, ""), "the * blanket deny must not leak")
    val other = verdicts(txt, "stranger", 1L -> "/anything")
    assert(other(1L) == (false, "/"), "unknown agents take the * group")
  }

  test("split groups for the same agent MERGE; rules before any group are ignored") {
    val txt = Seq(
      "Disallow: /orphan",        // before any User-agent → ignored
      "User-agent: bot",
      "Disallow: /one",
      "",
      "User-agent: other",
      "Disallow: /theirs",
      "",
      "User-agent: bot",
      "Disallow: /two").mkString("\n")
    val got = verdicts(txt, "bot",
      1L -> "/one/x", 2L -> "/two/y", 3L -> "/orphan", 4L -> "/theirs")
    assert(!got(1L)._1 && !got(2L)._1, "both split groups apply (merged)")
    assert(got(3L)._1, "pre-group rules impose nothing")
    assert(got(4L)._1, "another agent's group must not apply")
  }

  test("§2.2.3 wildcards: * spans segments, trailing $ anchors, literals stay literal") {
    val txt = Seq(
      "User-agent: bot",
      "Disallow: /a/*/z",          // * spans anything
      "Disallow: /b$",             // matches ONLY exactly /b
      "Allow: /a/keep/*z",         // longer → wins over /a/*/z where both match
      "Disallow: /c_d",            // _ is literal, not a wildcard
      "Disallow: /pct%25").mkString("\n")
    val got = verdicts(txt, "bot",
      1L -> "/a/x/y/z", 2L -> "/b", 3L -> "/b/deeper", 4L -> "/a/keep/zz",
      5L -> "/cXd", 6L -> "/c_d", 7L -> "/pct%25x")
    assert(got(1L) == (false, "/a/*/z"), s"got ${got(1L)}")
    assert(got(2L) == (false, "/b$"), "exact path matches the $ rule")
    assert(got(3L) == (true, ""), "$ must anchor — /b/deeper is NOT matched")
    assert(got(4L) == (true, "/a/keep/*z"), "longest pattern wins")
    assert(got(5L) == (true, ""), "_ is literal in rule paths")
    assert(got(6L) == (false, "/c_d"))
    assert(got(7L) == (false, "/pct%25"), "% is literal in rule paths")
  }

  test("CRLF line endings parse identically to LF (ADVICE r16 high)") {
    // the RFC 9309 grammar's OWN line ending — a "\n" split left \r on
    // every token, no rule ever matched, evaluation failed OPEN
    val txt = Seq(
      "User-agent: bot",
      "Disallow: /a",
      "Allow: /a/b").mkString("\r\n")
    val got = verdicts(txt, "bot", 1L -> "/a/x", 2L -> "/a/b/x", 3L -> "/free")
    assert(got(1L) == (false, "/a"), s"CRLF rules must match: ${got(1L)}")
    assert(got(2L) == (true, "/a/b"))
    assert(got(3L) == (true, ""))
  }

  test("blank and comment lines BETWEEN User-agent lines do not split the run") {
    // RFC 9309 ABNF: *(startgroupline / emptyline) — ADVICE r16
    val txt = Seq(
      "User-agent: alpha",
      "",
      "# both agents share the group below",
      "User-agent: bot",
      "Disallow: /shared",
      "",
      "User-agent: *",
      "Disallow: /").mkString("\n")
    val got = verdicts(txt, "alpha", 1L -> "/shared/x", 2L -> "/other")
    assert(got(1L) == (false, "/shared"),
      s"alpha must keep the group across the blank line: ${got(1L)}")
    assert(got(2L) == (true, ""), "the * blanket deny must not leak onto alpha")
  }

  test("rules match path PLUS query (ADVICE r16): /*? and /search?q= work") {
    val txt = Seq(
      "User-agent: bot",
      "Disallow: /search?q=",
      "Disallow: /private/*?",
      "Allow: /private/ok?").mkString("\n")
    val got = verdicts(txt, "bot",
      1L -> "/search?q=x", 2L -> "/search", 3L -> "/private/a?t=1",
      4L -> "/private/ok?t=1", 5L -> "/private/plain")
    assert(got(1L) == (false, "/search?q="), s"got ${got(1L)}")
    assert(got(2L) == (true, ""), "no query → the ?-rule must not match")
    assert(got(3L) == (false, "/private/*?"))
    assert(got(4L) == (true, "/private/ok?"), "longer allow wins on the query")
    assert(got(5L) == (true, ""))
  }

  test("Sitemap: directives extract group-independently, case kept, document order") {
    val txt = Seq(
      "Sitemap: http://h.example/Pre-Group.xml",   // before any group
      "User-agent: bot",
      "Disallow: /x",
      "sitemap: HTTP://h.example/Mixed.xml",       // name case-insensitive
      "",
      "User-agent: *",
      "Sitemap: http://h.example/in-star.xml",
      "Sitemap:").mkString("\r\n")                 // blank value drops
    val robots = Seq(("h.example", txt)).toDF("host", "txt")
    val got = Robots.sitemaps(robots, col("host"), col("txt"))
      .select(col("sm_idx"), col("sitemap_url"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      0L -> "http://h.example/Pre-Group.xml",
      1L -> "HTTP://h.example/Mixed.xml",
      2L -> "http://h.example/in-star.xml"), s"got $got")
    // and the rule parser keeps ignoring the directive
    val verdict = verdicts(txt, "bot", 1L -> "/x/1", 2L -> "/free")
    assert(verdict(1L) == (false, "/x") && verdict(2L) == (true, ""))
  }

  test("comments, unknown directives, empty values and case-insensitive names") {
    val txt = Seq(
      "USER-AGENT: Bot   # product token, case-insensitive",
      "Crawl-delay: 7",
      "Sitemap: http://h.example/map.xml",
      "Disallow:",                 // empty value → imposes nothing
      "DISALLOW: /x  # trailing comment",
      "Allow: ").mkString("\n")
    val got = verdicts(txt, "BOT", 1L -> "/x/deep", 2L -> "/y")
    assert(got(1L) == (false, "/x"))
    assert(got(2L) == (true, ""))
  }

  test("Crawl-delay: selected group's delay, exact beats *, merged groups take MIN, junk ignored, rules unaffected") {
    def delaysFor(pairs: (String, String)*): Map[String, Long] =
      Robots.crawlDelays(pairs.toSeq.toDF("host", "txt"),
          col("host"), col("txt"), "graftbot")
        .as[(String, Long)].collect().toMap
    val exactBeatsStar = Seq(
      "User-agent: graftbot", "Crawl-delay: 7", "Disallow: /p",
      "", "User-agent: *", "Crawl-delay: 2").mkString("\n")
    val starFallback = Seq(
      "User-agent: *", "Crawl-delay: 3", "Disallow: /q").mkString("\n")
    val mergedMin = Seq(
      "User-agent: graftbot", "Crawl-delay: 9",
      "", "User-agent: graftbot", "Crawl-delay: 5").mkString("\n")
    // decimal values (common in the wild: 'Crawl-delay: 0.5') must be
    // ignored like junk — the digits-only gate exists because DuckDB's
    // try_cast ROUNDS '1.5' to 2 while Spark's yields NULL (ADVICE r18)
    val junkOnly = Seq(
      "User-agent: *", "Crawl-delay: fast", "Crawl-delay: -1",
      "Crawl-delay: 0.5", "Crawl-delay: 1.5",
      "Disallow: /r").mkString("\n")
    // exact group exists but declares NO delay: the * delay must not
    // leak in (selection is by group, not by delay presence)
    val exactNoDelay = Seq(
      "User-agent: graftbot", "Disallow: /s",
      "", "User-agent: *", "Crawl-delay: 4").mkString("\n")
    val got = delaysFor(
      "a.example" -> exactBeatsStar, "b.example" -> starFallback,
      "c.example" -> mergedMin, "d.example" -> junkOnly,
      "e.example" -> exactNoDelay)
    assert(got == Map("a.example" -> 7L, "b.example" -> 3L,
      "c.example" -> 5L), s"got $got")
    // and the RULE parser still ignores the directive entirely
    val rules = Robots.ruleSet(
        Seq(("a.example", exactBeatsStar)).toDF("host", "txt"),
        col("host"), col("txt"))
      .select("rule").as[String].collect().toSet
    assert(rules == Set("disallow"), s"got $rules")
  }

  test("fetchPolicies: RFC 9309 §2.3.1 — 2xx rules, 4xx allow-all, 5xx disallow-all, redirects followed, loops/missing/budget fail open as unavailable") {
    def u(h: String, p: String) = s"http://$h.example$p"
    val seeds = Seq(
      "plain", "ok200", "gone404", "err503", "rel301", "loopy",
      "nowhere", "noloc", "deep")
      .map(h => (s"$h.example", u(h, "/robots.txt")))
      .toDF("host", "url_canon")
    val captures = Seq(
      // (url_canon, txt, status, location)
      (u("plain", "/robots.txt"), "User-agent: *\nDisallow: /a",
        None: Option[Long], None: Option[String]),
      (u("ok200", "/robots.txt"), "User-agent: *\nDisallow: /b",
        Some(204L), None: Option[String]),
      (u("gone404", "/robots.txt"), "User-agent: *\nDisallow: /poison",
        Some(404L), None: Option[String]),
      (u("err503", "/robots.txt"), "User-agent: *\nAllow: /poison",
        Some(503L), None: Option[String]),
      // a RELATIVE Location — resolution against the current fetch URL
      (u("rel301", "/robots.txt"), "poison", Some(301L), Some("/real.txt")),
      (u("rel301", "/real.txt"), "User-agent: *\nDisallow: /c",
        Some(200L), None: Option[String]),
      // a 2-cycle: budget exhausts → unavailable → allow_all
      (u("loopy", "/robots.txt"), "p", Some(301L), Some(u("loopy", "/b.txt"))),
      (u("loopy", "/b.txt"), "p", Some(302L), Some(u("loopy", "/robots.txt"))),
      // redirect to a never-captured URL → allow_all
      (u("nowhere", "/robots.txt"), "p", Some(301L), Some(u("nowhere", "/gone"))),
      // 3xx with NO Location → nothing to follow → allow_all
      (u("noloc", "/robots.txt"), "p", Some(307L), None: Option[String]),
      // a 4-hop chain INSIDE the 5-hop budget resolves
      (u("deep", "/robots.txt"), "p", Some(301L), Some("/h1")),
      (u("deep", "/h1"), "p", Some(302L), Some("/h2")),
      (u("deep", "/h2"), "p", Some(307L), Some("/h3")),
      (u("deep", "/h3"), "p", Some(308L), Some("/h4")),
      (u("deep", "/h4"), "User-agent: *\nDisallow: /d",
        Some(200L), None: Option[String]))
      .toDF("url_canon", "txt", "status", "location")
    val got = Robots.fetchPolicies(seeds, captures)
      .select(col("host"), col("policy"), col("txt"), col("hops"))
      .as[(String, String, Option[String], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3.orNull, r._4))).toMap
    assert(got("plain.example") ==
      (("rules", "User-agent: *\nDisallow: /a", 0L)), s"got $got")
    assert(got("ok200.example") ==
      (("rules", "User-agent: *\nDisallow: /b", 0L)))
    // poison bodies must come back NULL — structurally unparseable
    assert(got("gone404.example") == (("allow_all", null, 0L)))
    assert(got("err503.example") == (("disallow_all", null, 0L)))
    assert(got("rel301.example") ==
      (("rules", "User-agent: *\nDisallow: /c", 1L)))
    assert(got("loopy.example")._1 == "allow_all", s"got ${got("loopy.example")}")
    assert(got("nowhere.example") == (("allow_all", null, 1L)))
    assert(got("noloc.example") == (("allow_all", null, 0L)))
    assert(got("deep.example") ==
      (("rules", "User-agent: *\nDisallow: /d", 4L)))
  }
}
