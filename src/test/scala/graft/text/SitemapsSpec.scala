package graft.text

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** sitemaps.org `<loc>` extraction cases. */
class SitemapsSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(xml: String): Seq[(Long, String)] =
    Sitemaps.locs(Seq(("h", xml)).toDF("host", "xml"), col("xml"))
      .select(col("loc_idx"), col("loc_canon"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  test("CDATA-wrapped loc values unwrap before canonicalization (ADVICE r16)") {
    val xml = "<urlset>" +
      "<url><loc><![CDATA[http://h.example/a]]></loc></url>" +
      "<url><loc> <![CDATA[ http://h.example/b ]]> </loc></url>" +
      "<url><loc>http://h.example/plain</loc></url>" +
      "</urlset>"
    val got = extract(xml)
    assert(got.map(_._2) == Seq(
      "http://h.example/a", "http://h.example/b", "http://h.example/plain"),
      s"got $got")
  }

  test("document order, whitespace trim, and XML escapes decode") {
    val xml = "<urlset><url><loc>\n http://h.example/x?a=1&amp;b=2 \n</loc></url>" +
      "<url><loc>http://h.example/y</loc></url></urlset>"
    val got = extract(xml)
    assert(got.map(_._1) == Seq(0L, 1L), "document-order indices")
    assert(got.head._2.contains("a=1") && got.head._2.contains("b=2"),
      s"the &amp; must decode and both params survive: ${got.head._2}")
  }

  test("a stray ]]> inside an unwrapped value survives") {
    val xml = "<urlset><url><loc>http://h.example/odd]]>tail</loc></url></urlset>"
    val got = extract(xml)
    assert(got.size == 1 && got.head._2.contains("odd]]>tail"), s"got $got")
  }

  test("changefreq validates against the protocol enumeration; priority parses to milli and range-checks") {
    import org.apache.spark.sql.functions._
    val xml = "<urlset>" +
      "<url><loc>http://h.example/a</loc><changefreq> Daily </changefreq><priority>0.8</priority></url>" +
      "<url><loc>http://h.example/b</loc><changefreq>fortnightly</changefreq><priority>2.5</priority></url>" +
      "<url><loc>http://h.example/c</loc><priority>1.0</priority></url>" +
      "<url><loc>http://h.example/d</loc><changefreq>never</changefreq><priority>junk</priority></url>" +
      "</urlset>"
    val got = Sitemaps.urlEntries(
        Seq((1L, xml)).toDF("id", "xml"), col("xml"))
      .orderBy("url_idx")
      .select("changefreq", "priority_milli")
      .as[(Option[String], Option[Long])].collect().toSeq
    assert(got == Seq(
      (Some("daily"), Some(800L)),   // case-normalized, 0.8 → 800
      (None, None),                  // invalid enum, out-of-range priority
      (None, Some(1000L)),           // absent changefreq, 1.0 → 1000
      (Some("never"), None)),        // junk priority
      s"got $got")
  }
}
