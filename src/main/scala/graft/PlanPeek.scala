package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector (like Scratch — NOT part of the driver
  * contract): print the exchange/join/aggregate/window skeleton of any
  * gate entries' physical plans at sf0.001.
  *
  * Usage: tools/run.sh PlanPeek q144_host_stats q147_bpe_pack
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    for (n <- args) {
      println(s"===== $n")
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Aggregate") || l.contains("Window") || l.contains("Cartesian") ||
        l.contains("Generate")).mkString("\n"))
    }
    spark.stop()
  }
}
