package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** HTML→text block extraction: structural stripping, entity decode,
  * link-density boilerplate classification, and the map-only plan. */
class HtmlExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String) =
    HtmlExtract.blocks(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", col("html"))
      .orderBy("block_idx")
      .select("block_text", "n_chars", "link_density_bp", "is_boilerplate")
      .as[(String, Long, Long, Boolean)].collect().toSeq

  test("script, style and comments vanish with their contents; blocks split at block tags") {
    val out = extract(
      "<html><head><style>p { color: red }</style>" +
        "<script>var x = '<p>not a block</p>';</script></head>" +
        "<body><!-- navigation comment --><h1>The Heading</h1>" +
        "<p>First paragraph of real content here.</p>" +
        "<p>Second paragraph, also real content.</p></body></html>")
    assert(out.map(_._1) == Seq(
      "The Heading",
      "First paragraph of real content here.",
      "Second paragraph, also real content."))
    assert(out.forall(b => !b._1.contains("not a block")))
  }

  test("entities decode once, single-pass semantics (&amp;lt; stays &lt;)") {
    val out = extract("<p>Fish &amp; chips &lt;tasty&gt;&nbsp;&#39;quoted&#39; &amp;lt;</p>")
    assert(out.map(_._1) == Seq("Fish & chips <tasty> 'quoted' &lt;"))
  }

  test("numeric references decode over full Unicode; junk and non-scalars pass through") {
    val out = extract(
      "<p>&#70;ine &#x70;rint &#0065; &#9999; &#x110000; &#xZZ; &# 65; 100&#37;</p>")
    // F (70), p (0x70), A (65 with leading zeros), ✏ (9999 — decodes
    // now, full-Unicode r16); past-the-last-plane and malformed stay
    // literal; %(37)
    assert(out.map(_._1) ==
      Seq("Fine print A ✏ &#x110000; &#xZZ; &# 65; 100%"))
  }

  test("supplementary-plane, accented and uppercase NAMED references decode; surrogates don't") {
    val out = extract(
      "<p>Caf&eacute; &Uuml;ber &mdash; &hellip; &euro;2 &#x1F600; &#55296; &bogus;</p>")
    assert(out.map(_._1) ==
      Seq("Café Über — … €2 😀 &#55296; &bogus;"))
  }

  test("&nbsp; decodes to U+00A0 and collapses as whitespace") {
    val out = extract("<p>one&nbsp;&nbsp;two&nbsp; three no-break words here</p>")
    assert(out.map(_._1) == Seq("one two three no-break words here"))
  }

  test("&amp;#65; decodes single-pass to the literal text &#65;") {
    val out = extract("<p>the reference &amp;#65; is written as-is here</p>")
    assert(out.map(_._1) == Seq("the reference &#65; is written as-is here"))
  }

  test("&#38;lt; decodes single-pass to the literal text &lt; (numeric-amp marker)") {
    val out = extract("<p>source sample: &#38;lt;b&#38;gt; and a plain &#38; char</p>")
    assert(out.map(_._1) == Seq("source sample: &lt;b&gt; and a plain & char"))
  }

  test("interleaved script/style drops match the sequential-pass order (script first)") {
    // sequential passes: the script pass removes '<script>B</style>C</script>'
    // first, keeping 'A' — the same order the oracle replays
    val out = extract(
      "<p>pad to content length</p><style>A<script>B</style>C</script><p>pad two text</p>")
    assert(out.map(_._1) == Seq("pad to content length", "A", "pad two text"))
  }

  test("a link-only nav block classifies boilerplate; prose with one link does not") {
    val out = extract(
      "<p>A long enough paragraph of genuine readable content with " +
        "<a href=\"/ref\">one link</a> inside it that stays content.</p>" +
        "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a> <a href=\"/c\">Contact</a></div>" +
        "<p>tiny</p>")
    val (prose, nav, tiny) = (out(0), out(1), out(2))
    assert(!prose._4 && prose._3 < HtmlExtract.MaxLinkDensityBp,
      s"prose misclassified: $prose")
    assert(nav._4 && nav._3 > HtmlExtract.MaxLinkDensityBp,
      s"nav not boilerplate: $nav")
    assert(tiny._4 && tiny._2 < HtmlExtract.MinContentChars,
      s"short block not boilerplate: $tiny")
  }

  test("link-density arithmetic is exact: chars inside anchors over block chars") {
    // block text = "Home About" (10 chars), link chars = 4 + 5 = 9
    val out = extract("<div><a href=\"/h\">Home</a> <a href=\"/a\">About</a></div>")
    assert(out == Seq(("Home About", 10L, 10000L * 9 / 10, true)))
  }

  test("anchors pair hrefs with visible text; unclosed anchors are outlinks but not pairs") {
    val html = "<p><a href=\"/a\">First &amp; best</a> " +
      "<script><a href=\"/ghost\">never</a></script>" +
      "<a name=\"x\">no href</a> " +
      "<a href=\"/unclosed\">dangling " + // no </a> — q150 sees it, q155 doesn't
      "</p>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val hrefs = df.select(explode(HtmlExtract.hrefs(col("html")))).as[String]
      .collect().toSeq
    assert(hrefs == Seq("/a", "/unclosed"),
      s"hrefs must keep unclosed anchors and drop scripts/no-href: $hrefs")
    val pairs = df.select(explode(HtmlExtract.anchors(col("html"))).as("a"))
      .select(HtmlExtract.anchorHref(col("a")),
        HtmlExtract.anchorText(col("a")))
      .as[(String, String)].collect().toSeq
    assert(pairs == Seq(("/a", "First & best")),
      s"anchor pairs must require the closing tag and decode entities: $pairs")
  }

  test("CDATA sections vanish with their contents") {
    val out = extract(
      "<p>Real content paragraph stays.</p>" +
        "<![CDATA[var x = \"<p>hidden pseudo-block</p>\";]]>" +
        "<p>And the closing paragraph too.</p>")
    assert(out.map(_._1) == Seq(
      "Real content paragraph stays.", "And the closing paragraph too."),
      s"got ${out.map(_._1)}")
  }

  test("single-quoted href attributes extract like double-quoted ones") {
    val html = "<p><a href='/single'>one</a> <a href=\"/double\">two</a></p>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val hrefs = df.select(explode(HtmlExtract.hrefs(col("html")))).as[String]
      .collect().toSeq
    assert(hrefs == Seq("/single", "/double"), s"got $hrefs")
    val pairs = df.select(explode(HtmlExtract.anchors(col("html"))).as("a"))
      .select(HtmlExtract.anchorHref(col("a")), HtmlExtract.anchorText(col("a")))
      .as[(String, String)].collect().toSeq
    assert(pairs == Seq(("/single", "one"), ("/double", "two")), s"got $pairs")
  }

  test("HTML5 names decode: ASCII alias, supplementary-plane alphabets, Cyrillic, MULTI-codepoint; unknown stays literal") {
    val df = Seq((1L,
      "&excl; &Ascr; &Bopf; &acy;&zhcy; &Amacr; &varphi; &checkmark; &NotLessLess; &NotARealRef;"))
      .toDF("doc_id", "html")
    val got = df.select(HtmlExtract.decodeEntities(col("html"))).as[String].head()
    assert(got == "! 𝒜 𝔹 аж Ā ϕ ✓ ≪̸ &NotARealRef;",
      s"got ${got.toSeq.map(_.toInt.toHexString)}")
  }

  test("attributes merely ending in href (data-href) never capture the target") {
    // ADVICE r16: the lazy [^>]*?href stopped at the FIRST 'href'
    // substring — <a data-href="/wrong" href="/right"> yielded /wrong
    val html = "<p><a data-href=\"/wrong\" href=\"/right\">txt</a>" +
      " <a\nhref=\"/newline-delim\">nl</a></p>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val hrefs = df.select(explode(HtmlExtract.hrefs(col("html")))).as[String]
      .collect().toSeq
    assert(hrefs == Seq("/right", "/newline-delim"), s"got $hrefs")
    val pairs = df.select(explode(HtmlExtract.anchors(col("html"))).as("a"))
      .select(HtmlExtract.anchorHref(col("a")), HtmlExtract.anchorText(col("a")))
      .as[(String, String)].collect().toSeq
    assert(pairs == Seq(("/right", "txt"), ("/newline-delim", "nl")), s"got $pairs")
  }

  test("baseHref: only the FIRST base with an href counts; script/comment/CDATA decoys are not markup; absent is NULL") {
    val df = Seq(
      (1L, "<html><head><title>t</title>" +
        "<script>var s = '<base href=\"/script-decoy/\">';</script>" +
        "<!-- <base href=\"/comment-decoy/\"> -->" +
        "<![CDATA[<base href='/cdata-decoy/'>]]>" +
        "<base target=\"_top\" href=\"http://b.example/dir/\">" +
        "</head><body><base href='/second/'></body></html>"),
      (2L, "<html><head><base href='../rel/'></head><body></body></html>"),
      (3L, "<html><body><p>no base at all</p></body></html>"),
      // database ≠ base: the \b boundary + \shref delimiter must hold
      (4L, "<html><head><database href=\"/wrong/\"></database></head></html>"))
      .toDF("doc_id", "html")
    val got = df.select(col("doc_id"), HtmlExtract.baseHref(col("html")))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("http://b.example/dir/"), s"got ${got(1L)}")
    assert(got(2L).contains("../rel/"), s"got ${got(2L)}")
    assert(got(3L).isEmpty, s"got ${got(3L)}")
    assert(got(4L).isEmpty, s"got ${got(4L)}")
  }

  test("alternateLinks: rel token match, hreflang required, case-insensitive BCP 47 keying, document order") {
    val df = Seq(
      (1L, "<html><head>" +
        "<link rel=\"alternate\" hreflang=\"DE-at\" href=\"/de\">" +
        "<link hreflang=\"en\" rel=\"alternate\" href=\"en/rel\">" + // attr order
        "<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed\">" + // no hreflang
        "<link rel=\"alternatexx\" hreflang=\"fr\" href=\"/fr\">" + // substring trap
        "<link rel=\"stylesheet\" href=\"/css\">" +
        "<link hreflang=\"x-default\" rel=\"ALTERNATE\" href=\"/\">" +
        "</head><body><a hreflang=\"sv\" href=\"/a\">anchor, not a link tag</a>" +
        "</body></html>"))
      .toDF("doc_id", "html")
    val got = df.select(posexplode(HtmlExtract.alternateLinks(col("html"))))
      .select(col("pos"),
        HtmlExtract.linkHreflang(col("col")),
        HtmlExtract.linkHref(col("col")))
      .as[(Int, String, String)].collect().toSeq
    assert(got == Seq((0, "de-at", "/de"), (1, "en", "en/rel"),
      (2, "x-default", "/")), s"got $got")
  }

  test("the block plan is map-only: one generator, zero exchanges") {
    val df = HtmlExtract.blocks(
      Seq((1L, "<p>x</p>")).toDF("doc_id", "html"), "doc_id", col("html"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"extraction must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected the posexplode generator:\n$p")
  }
}
