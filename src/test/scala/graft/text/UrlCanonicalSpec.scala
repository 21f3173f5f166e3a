package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** URL canonicalization semantics, edge by edge. */
class UrlCanonicalSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlCanonical.canonicalize($"url")).as[String]
      .collect().toSeq

  test("case, default ports, trailing slash, fragments, tracking params, param order") {
    val got = canon(
      "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&b=2&a=1#frag",
      "https://host.org:443/p",
      "https://host.org:8443/p",            // non-default port KEPT
      "http://h.io/CaseSensitivePath",      // path case preserved
      "http://h.io/",                       // root slash KEPT (the one exception)
      "http://h.io/x?utm_source=a&utm_medium=b&fbclid=1&gclid=2", // all tracked
      "http://h.io/x?z=1&a=2")
    assert(got == Seq(
      "http://www.example.com/A/b?a=1&b=2",
      "https://host.org/p",
      "https://host.org:8443/p",
      "http://h.io/CaseSensitivePath",
      "http://h.io/",
      "http://h.io/x",
      "http://h.io/x?a=2&z=1"))
  }

  test("variants of one logical URL collapse to one canonical string") {
    val variants = canon(
      "http://site.org/Page/5?b=2&a=1",
      "HTTP://Site.ORG/Page/5/?b=2&a=1",
      "http://site.org:80/Page/5?utm_source=feed&b=2&a=1#sec")
    assert(variants.distinct.size == 1, s"did not collapse: $variants")
  }

  test("http default port on https (and vice versa) is NOT stripped") {
    assert(canon("https://h.io:80/p") == Seq("https://h.io:80/p"))
    assert(canon("http://h.io:443/p") == Seq("http://h.io:443/p"))
  }

  test("percent-encoding: unreserved escapes decode, others uppercase, junk survives") {
    val got = canon(
      "http://h.io/%7Euser",              // ~ is unreserved → decodes
      "http://h.io/~user",                // already literal → same key
      "http://h.io/a%2fb",                // / is reserved → %2F, not decoded
      "http://h.io/a%2Fb",
      "http://h.io/%41%62c",              // A and b decode (case preserved)
      "http://h.io/x%zz%4",               // malformed escapes pass through
      "http://h.io/100%")                 // dangling % at end survives
    assert(got(0) == "http://h.io/~user" && got(0) == got(1))
    assert(got(2) == "http://h.io/a%2Fb" && got(2) == got(3))
    assert(got(4) == "http://h.io/Abc")
    assert(got(5) == "http://h.io/x%zz%4")
    assert(got(6) == "http://h.io/100%")
  }

  test("IDN hosts collapse with their punycode spelling; ASCII hosts never change") {
    val got = canon(
      "http://BÜCHER.example/p",
      "http://xn--bcher-kva.example/p",
      "http://shop.bücher.example/p",
      "http://plain-ascii.example/p")
    assert(got(0) == "http://xn--bcher-kva.example/p" && got(0) == got(1))
    assert(got(2) == "http://shop.xn--bcher-kva.example/p")
    assert(got(3) == "http://plain-ascii.example/p")
  }

  test("a query embedding an ABSOLUTE URL parses on the OUTER host (first-'://' split)") {
    // redirect/tracking params are common real-crawl shapes; the old
    // last-'://' split re-rooted the whole parse on the embedded host
    // (ADVICE r15 medium)
    val url = "http://a.com/r?next=http://b.com/x&z=1"
    assert(canon(url) == Seq("http://a.com/r?next=http://b.com/x&z=1"))
    val host = Seq(url).toDF("url")
      .select(UrlCanonical.hostOf($"url")).as[String].collect().toSeq
    assert(host == Seq("a.com"), s"hostOf leaked the embedded host: $host")
  }

  test("empty path normalizes to '/' (§6.2.3); query after empty path parses") {
    assert(canon("http://h.io", "http://h.io/", "HTTP://H.IO#f") ==
      Seq("http://h.io/", "http://h.io/", "http://h.io/"))
    assert(canon("http://h.io?b=2&a=1") == Seq("http://h.io/?a=1&b=2"))
    val host = Seq("http://h.io?b=2&a=1").toDF("url")
      .select(UrlCanonical.hostOf($"url")).as[String].collect().toSeq
    assert(host == Seq("h.io"))
  }

  test("an invalid IDN host passes through unchanged (total function)") {
    // an empty non-ASCII-adjacent label IDN.toASCII rejects
    val junk = "http://bad..ü.example/p"
    assert(canon(junk) == Seq("http://bad..ü.example/p"))
  }

  // ---------------------------- RFC 3986 §5 reference resolution (r16)

  private def res(base: String, refs: String*): Seq[String] =
    refs.map(r => (base, r)).toDF("base", "ref")
      .select(UrlCanonical.resolve($"base", $"ref")).as[String]
      .collect().toSeq

  test("RFC 3986 §5.4.1 normal reference examples (hierarchical subset)") {
    val base = "http://a/b/c/d;p?q"
    val got = res(base,
      "g", "./g", "g/", "/g", "//g", "?y", "g?y", "#s", "g#s", "",
      "g?y#s", ";x", "g;x", ".", "./", "..", "../", "../g",
      "../..", "../../", "../../g")
    assert(got == Seq(
      "http://a/b/c/g", "http://a/b/c/g", "http://a/b/c/g/", "http://a/g",
      "http://g", "http://a/b/c/d;p?y", "http://a/b/c/g?y",
      "http://a/b/c/d;p?q", "http://a/b/c/g", "http://a/b/c/d;p?q",
      "http://a/b/c/g?y", "http://a/b/c/;x", "http://a/b/c/g;x",
      "http://a/b/c/", "http://a/b/c/", "http://a/b/", "http://a/b/",
      "http://a/b/g", "http://a/", "http://a/", "http://a/g"), s"got $got")
  }

  test("RFC 3986 §5.4.2 abnormal examples: dot segments cannot climb above root") {
    val base = "http://a/b/c/d;p?q"
    val got = res(base,
      "../../../g", "../../../../g", "/./g", "/../g", "g.", ".g",
      "g..", "..g", "./../g", "./g/.", "g/./h", "g/../h",
      "g;x=1/./y", "g;x=1/../y")
    assert(got == Seq(
      "http://a/g", "http://a/g", "http://a/g", "http://a/g",
      "http://a/b/c/g.", "http://a/b/c/.g", "http://a/b/c/g..",
      "http://a/b/c/..g", "http://a/b/g", "http://a/b/c/g/",
      "http://a/b/c/g/h", "http://a/b/c/h", "http://a/b/c/g;x=1/y",
      "http://a/b/c/y"), s"got $got")
  }

  test("resolution keeps the base's RAW spelling; canonicalize composes after") {
    val got = res("HTTP://BÜCHER.example:80/Page/7/%7Eusr/?b=1",
      "../up/one", "//other.example/x", "?lang=en", "")
    assert(got == Seq(
      "HTTP://BÜCHER.example:80/Page/7/up/one",
      "HTTP://other.example/x",
      "HTTP://BÜCHER.example:80/Page/7/%7Eusr/?lang=en",
      "HTTP://BÜCHER.example:80/Page/7/%7Eusr/?b=1"), s"got $got")
    val canoned = Seq(("HTTP://BÜCHER.example:80/Page/7/%7Eusr/?b=1", "../up/one"))
      .toDF("base", "ref")
      .select(UrlCanonical.canonicalize(
        UrlCanonical.resolve($"base", $"ref"))).as[String].collect().toSeq
    assert(canoned == Seq("http://xn--bcher-kva.example/Page/7/up/one"))
  }

  test("removeDotSegments handles empty segments and directory endings") {
    val got = Seq("/a//b/../c", "/a/./b/.", "/..", "/a/b/..", "")
      .toDF("p").select(UrlCanonical.removeDotSegments($"p")).as[String]
      .collect().toSeq
    assert(got == Seq("/a//c", "/a/b/", "/", "/a/", ""), s"got $got")
  }
}
