package graft.olhovivo

import java.nio.file.{Files, Path}
import java.time.Instant

/** EP2 tests: fixture JSON day per FIXTURES.md §1 — nominal polls, one
  * corrupt file (F2 isolation), a vehicle missing `a` (typed null), and
  * the E1 timestamp parse checked against java.time (independent of the
  * Spark code path). */
class IngestPositionsSpec extends SparkTestBase {

  private def writeDay(dir: Path): Unit = {
    val hourDir = dir.resolve("year=2025/month=03/day=06/hour=14")
    Files.createDirectories(hourDir)
    Files.writeString(hourDir.resolve("data_20250306_143200.json"),
      """{"hr": "14:32", "l": [
        |  {"c": "5015-10", "cl": 33887, "sl": 2,
        |   "lt0": "JD. SAO JORGE", "lt1": "METRO JABAQUARA",
        |   "vs": [
        |     {"p": "68546", "a": true, "ta": "2025-03-06T14:31:48Z",
        |      "py": -23.6787125, "px": -46.65674},
        |     {"p": "68012", "a": false, "ta": "2025-03-06T14:31:02Z",
        |      "py": -23.5505, "px": -46.6333}]}]}""".stripMargin)
    Files.writeString(hourDir.resolve("data_20250306_143300.json"),
      """{"hr": "14:33", "l": [
        |  {"c": "701U-10", "cl": 101, "sl": 1, "lt0": "X", "lt1": "Y",
        |   "vs": [{"p": "11111", "ta": "2025-03-06T14:32:40Z",
        |           "py": -23.5, "px": -46.6}]}]}""".stripMargin) // `a` missing
    Files.writeString(hourDir.resolve("data_corrupt.json"),
      """{"hr": "14:34", "l": [ TRUNCATED GARBAGE""")
  }

  test("EP2 flatten: two-level unnest, renames, typed null for missing a, corrupt file isolated") {
    val dir = scratchDir("rawday")
    writeDay(dir)
    val flat = IngestPositions.flatten(
      IngestPositions.readRaw(spark, dir.toString + "/year=2025/month=03/day=06"))
    val rows = flat.collect()
    assert(rows.length == 3, s"corrupt file must be skipped, got ${rows.length} rows")

    val bySchema = flat.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(bySchema("timestamp") == "long")
    assert(bySchema("acessibilidade") == "boolean")
    assert(bySchema("codigo_linha") == "integer")

    val r68546 = rows.find(_.getAs[String]("prefixo_veiculo") == "68546").get
    // E1 parity: compare against java.time, not our own Spark expression
    assert(r68546.getAs[Long]("timestamp") ==
      Instant.parse("2025-03-06T14:31:48Z").getEpochSecond)
    assert(r68546.getAs[Boolean]("acessibilidade"))
    assert(r68546.getAs[String]("letreiro") == "5015-10")
    assert(r68546.getAs[Double]("py") == -23.6787125)

    val r11111 = rows.find(_.getAs[String]("prefixo_veiculo") == "11111").get
    assert(r11111.isNullAt(r11111.fieldIndex("acessibilidade")),
      "missing `a` must surface as typed null, not type drift")
  }

  test("EP2 distributed decode: row-identical to the multiLine source, corrupt file isolated") {
    val dir = scratchDir("rawday_dist")
    writeDay(dir)
    val day = dir.toString + "/year=2025/month=03/day=06"
    val viaSource = IngestPositions.flatten(IngestPositions.readRaw(spark, day))
    val viaRedistribute = IngestPositions.flatten(
      IngestPositions.readRawDistributed(spark, day))
    // full-row multiset equality via the order-independent, NULL-distinct
    // fingerprint (a plain anti-join would treat the typed-null
    // acessibilidade row as unmatched: null ≠ null under join equality)
    assert(viaSource.schema == viaRedistribute.schema)
    assert(graft.SpillProbe.fingerprint(viaSource) ==
      graft.SpillProbe.fingerprint(viaRedistribute))
    assert(viaRedistribute.count() == 3)
  }

  test("EP2 run: writes date-partitioned parquet readable with the posicoes schema") {
    val dir = scratchDir("rawday2")
    writeDay(dir)
    val out = scratchDir("posout").toString + "/posicoes"
    IngestPositions.run(spark, dir.toString + "/year=2025/month=03/day=06", out)
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.columns.contains("data"), "output must be partitioned by event date")
    // partition pruning works on the written layout — verify in the PLAN
    // (D1: date-scoped reads must prune, not scan-and-filter)
    val pruned = back.filter(back("data") === "2025-03-06")
    assert(pruned.count() == 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(data"),
      s"date filter did not reach partition pruning:\n$plan")
  }
}
