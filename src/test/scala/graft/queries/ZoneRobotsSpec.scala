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
    assert(out.forall(r => r._2 == "default" || r._2 == "allow" || r._2 == "disallow"))
  }

  test("the zone's robots captures are ordinary records response-filtered by path") {
    val zone = WebGraphOps.robotsZoneFor(spark, dir)
    val recs = graft.sources.Warc.readExactClean(spark, zone)
    val robots = recs.filter(endswith(col("url"), lit("/robots.txt")))
    val pages = recs.filter(!endswith(col("url"), lit("/robots.txt")))
    assert(robots.count() == 12, "13 hosts minus the corrupt capture")
    assert(pages.count() > 0, "page responses share the same files")
  }
}
