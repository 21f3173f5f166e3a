package graft.queries

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** q160's zone-sourced robots composition (VERDICT r16 next #2): the
  * rules come from WARC captures, and a CORRUPT capture fails open for
  * exactly its own host. */
class ZoneRobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("corrupt robots capture fails open for its host only; zone rules fire elsewhere") {
    val out = WebGraphOps.q160ZoneRobotsGate(spark, dir)
      .select(col("host"), col("rule"))
      .as[(String, String)].collect().toSeq
    val byHost = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // host 5's capture is written with the Content-Length-overstated
    // residue → invalid → dropped → NO rules → default-allow only
    assert(byHost("site5.xn--bcher-kva.example") == Set("default"),
      s"host 5 must fail open: ${byHost("site5.xn--bcher-kva.example")}")
    // an even host's exact-group rules reached the verdicts from the zone
    assert(byHost("site0.xn--bcher-kva.example").contains("disallow"),
      s"zone rules must fire on host 0: ${byHost("site0.xn--bcher-kva.example")}")
    // r19 §2.3.1 classes: the 404 host fails OPEN (its poison deny-all
    // body never parses), the 503 host fails CLOSED (every verdict
    // 'unavailable'), and the 301 host's rules arrive via the redirect
    // target (OddRobots — its poison source body never parses)
    assert(byHost("site7.xn--bcher-kva.example") == Set("default"),
      s"404 host must fail open: ${byHost("site7.xn--bcher-kva.example")}")
    assert(byHost("site9.xn--bcher-kva.example") == Set("unavailable"),
      s"503 host must fail closed: ${byHost("site9.xn--bcher-kva.example")}")
    assert(byHost("site11.xn--bcher-kva.example").contains("disallow"),
      s"redirected rules must fire on host 11: ${byHost("site11.xn--bcher-kva.example")}")
    assert(out.forall(r => Set("default", "allow", "disallow",
      "unavailable").contains(r._2)))
  }

  test("the zone's robots captures are ordinary records response-filtered by path") {
    val zone = WebGraphOps.robotsZoneFor(spark, dir)
    val recs = graft.sources.Warc.readExactClean(spark, zone)
    val robots = recs.filter(endswith(col("url"), lit("/robots.txt")))
    val pages = recs.filter(!endswith(col("url"), lit("/robots.txt")))
    assert(robots.count() == 12, "13 hosts minus the corrupt capture")
    assert(recs.filter(endswith(col("url"), lit("/robots-real.txt")))
      .count() == 1, "host 11's redirect target is an ordinary record")
    assert(pages.count() > 0, "page responses share the same files")
  }
}
