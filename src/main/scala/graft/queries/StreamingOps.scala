package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingSpeeds
import graft.streaming.StreamingSpeeds.Position

/** Structured Streaming visibility in the correctness gate: run the
  * stateful EP3 hop pipeline as an actual streaming query (file source →
  * flatMapGroupsWithState → memory sink) over a zone written from the
  * deterministic positions view, then return the collected hop table.
  *
  * Declared WITHOUT an oracle (rows-only, q90 convention): the driver's
  * DuckDB compare has no streaming analog, and same-second ties make
  * individual hop values order-ambiguous (exactly the reference's trap
  * ② — the row COUNT is stable, values on tie boundaries are not).
  * Batch-vs-streaming VALUE parity is asserted tie-free in
  * StreamingSpeedsSpec instead. */
object StreamingOps {

  type Q = (SparkSession, String) => DataFrame

  /** One-shot streaming run: positions → JSON landing zone (distributed
    * write, no driver collect) → readStream (2 files per micro-batch) →
    * cleaned hops. Each vehicle's history sits in ONE zone file, so this
    * entry exercises incremental file discovery and stateful processing
    * per batch; CROSS-batch state carry-over for a split vehicle is
    * covered (tie-free) by StreamingSpeedsSpec instead. */
  def q75StreamingHops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val zone = Files.createTempDirectory("graft_stream_zone").toString
    // vehicle-partitioned, time-sorted zone: a vehicle's history stays
    // within one file, so micro-batch boundaries can't reorder it (the
    // file source discovers files independently of event time; cross-
    // batch ordering for a SPLIT vehicle is exercised — tie-free — in
    // StreamingSpeedsSpec)
    OlhoVivo.posicoesFromEvents(s, dir)
      .select(col("prefixo_veiculo"), col("timestamp"), col("py"), col("px"))
      .repartition(4, col("prefixo_veiculo"))
      .sortWithinPartitions(col("prefixo_veiculo"), col("timestamp"))
      .write.mode("overwrite").json(zone)
    val positions = s.readStream
      .schema("prefixo_veiculo STRING, timestamp LONG, py DOUBLE, px DOUBLE")
      .option("maxFilesPerTrigger", "2")
      .json(zone)
      .as[Position]
    val query = StreamingSpeeds.hopsStream(positions)
      .writeStream.format("memory").queryName("q75_hops")
      .outputMode("append").start()
    try query.processAllAvailable()
    finally query.stop()
    // the memory sink holds the results; drop the zone (repeated bench/
    // gate invocations would otherwise accumulate JSON copies in /tmp)
    val hops = s.table("q75_hops")
      .select(col("prefixo_veiculo"), col("timestamp"), col("tempo"),
        round(col("distancia"), 2).as("distancia"))
      .localCheckpoint(true)
    deleteRecursively(new java.io.File(zone))
    hops
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  val queries: Map[String, Q] = Map(
    "q75_streaming_hops" -> q75StreamingHops,
  )

  /** Intentionally empty: streaming has no DuckDB analog (rows-only). */
  val oracles: Map[String, String] = Map.empty
}
