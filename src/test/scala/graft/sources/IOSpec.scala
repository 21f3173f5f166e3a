package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.olhovivo.SparkTestBase

class IOSpec extends SparkTestBase {
  import spark.implicits._

  test("orc round-trip preserves values; partition column prunes the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq(
      ("2024-01-01", 1L, 1.5),
      ("2024-01-01", 2L, 2.5),
      ("2024-01-02", 3L, 3.5)
    ).toDF("day", "id", "v")
    IO.writePartitionedOrc(df, dir, Seq("day"))

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("day", StringType)))
    val back = IO.readOrc(spark, schema, dir)
    assert(back.count() == 3)
    val day1 = back.filter(col("day") === "2024-01-01")
    assert(day1.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L))
    // partition pruning: the filtered plan reads one partition directory
    val planStr = day1.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), s"no partition filters:\n$planStr")
  }

  test("orc declared schema surfaces missing fields as typed nulls, not drift") {
    val dir = Files.createTempDirectory("graft_orc2").toString
    Seq((1L, "x")).toDF("id", "present").write.mode("overwrite").orc(dir)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("missing_col", StringType)))
    val back = IO.readOrc(spark, schema, dir).collect()
    assert(back.length == 1 && back.head.getLong(0) == 1L && back.head.isNullAt(1))
  }
}
