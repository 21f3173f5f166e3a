package graft.operators

import org.apache.spark.sql.functions._

import graft.olhovivo.SparkTestBase

/** Evidence for the README's "AQE skew splitting" claim: the library's
  * stated posture for UNFORESEEN skew (foreseen skew gets explicit
  * salting — SaltedJoin/SkewedAggregate) is that AQE's runtime re-plan
  * splits an oversized shuffle partition into parallel sub-reads. This
  * spec manufactures a 90%-one-key join, forces the shuffle path, and
  * asserts the executed plan actually carries the skew=true split —
  * the knob a 100 TB deployment relies on when a hot key appears in
  * production data that no one salted ahead of time. */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits the skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local-test thresholds: the skewed partition (~2 MB) must exceed
      // both the absolute threshold and factor × median (~tens of KB)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072",
      // force the sort-merge path: broadcast would (correctly) dodge the
      // skew, but the claim under test is the shuffle-join split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // disabling demotion keeps the assert about the split itself
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    SparkTestBase.sessionConfLock.synchronized {
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // 90% of 200k fact rows share key 0 → one shuffle partition
        // holds megabytes while the median holds ~50 KB. The consumer is
        // a GLOBAL aggregate (partial per partition, no clustering
        // requirement): a per-key groupBy downstream would make Spark
        // correctly SKIP the split, since re-partitioning the split
        // output would cost the extra shuffle the split tried to avoid.
        // The payload flows into the aggregate so pruning can't shrink
        // the skewed partition below the detection threshold.
        val fact = spark.range(200000)
          .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
            concat(lit("padding-padding-padding-"), col("id")).as("payload"))
        val dim = spark.range(2000).select(col("id").as("k2"), (col("id") * 7).as("attr"))
        val joined = fact.join(dim, col("k") === col("k2"))
          .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
        val rows = joined.collect()
        // correctness unaffected by the split: key 0 matches all 180k
        // fact rows; keys 9,19,…,1999 add 200 more
        assert(rows.head.getLong(0) == 180200L, s"join row count: ${rows.head}")
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("skew=true"),
          s"AQE did not split the skewed partition:\n$p")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
