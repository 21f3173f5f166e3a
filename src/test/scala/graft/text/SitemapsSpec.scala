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
}
