package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.olhovivo.{SparkTestBase, SpeedPipeline}
import graft.olhovivo.SpeedPipeline.SpeedConf
import StreamingSpeeds._

/** Streaming EP3 must agree with the batch pipeline on the same
  * positions (SURVEY.md §7.4 #5): the stateful lag reproduces the
  * window lag, cleaning rules included. */
class StreamingSpeedsSpec extends SparkTestBase {
  import spark.implicits._

  private val positions = Seq(
    Position("A", 1000, -23.5500, -46.6300),
    Position("A", 1100, -23.5510, -46.6305),  // normal hop
    Position("A", 1800, -23.5530, -46.6310),  // 700s gap → dropped (P2)
    Position("A", 1900, -23.5531, -46.6311),  // normal hop
    Position("B", 1000, -23.5600, -46.6300),
    Position("B", 1500, -23.5605, -46.6302),  // normal hop
    // C: identical-coordinate duplicate at the same ts — tempo=0 is
    // dropped under EITHER tie order (the reference itself is
    // order-ambiguous under ties, SURVEY.md §2.2 trap ②)
    Position("C", 1000, -23.5700, -46.6400),
    Position("C", 1000, -23.5700, -46.6400),
    Position("C", 1300, -23.5703, -46.6401))

  test("streaming hops match batch SpeedPipeline.hops") {
    val input = MemoryStream[Position](spark)
    val query = hopsStream(input.toDS(), SpeedConf())
      .writeStream.format("memory").queryName("hops_out")
      .outputMode("append").start()
    try {
      // two micro-batches split mid-stream per vehicle → state carries over
      input.addData(positions.take(3))
      query.processAllAvailable()
      input.addData(positions.drop(3))
      query.processAllAvailable()

      val streamed = spark.table("hops_out")
        .select($"prefixo_veiculo", $"timestamp", $"tempo", $"distancia", $"velocidade_media")
        .collect().map(_.toSeq).toSet

      val batchInput = positions.toDF()
        .withColumn("letreiro", lit("X")).withColumn("codigo_linha", lit(1))
        .withColumn("sentido_linha", lit(1)).withColumn("destino_linha", lit("D"))
        .withColumn("origem_linha", lit("O")).withColumn("acessibilidade", lit(true))
      val batch = SpeedPipeline.hops(batchInput, SpeedConf(), Seq($"py"))
        .select($"prefixo_veiculo", $"timestamp", $"tempo", $"distancia", $"velocidade_media")
        .collect().map(_.toSeq).toSet

      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.nonEmpty)
      // A's 700s gap dropped; C's tempo=0 duplicate dropped
      assert(streamed.count(_.head == "A") == 2)
      assert(streamed.count(_.head == "B") == 1)
      assert(streamed.count(_.head == "C") == 1)
    } finally query.stop()
  }

  test("keyed stream: event_id tiebreak makes same-second ties deterministic") {
    // two DIFFERENT positions at the same second — the unkeyed path's
    // hop values would depend on arrival order; the keyed path must
    // produce the batch result (ORDER BY timestamp, event_id) under
    // BOTH arrival orders
    val tied = Seq(
      KeyedPosition("T", 1L, 1000, -23.5500, -46.6300),
      KeyedPosition("T", 2L, 1060, -23.5510, -46.6305),
      KeyedPosition("T", 3L, 1060, -23.5520, -46.6310), // same-second tie
      KeyedPosition("T", 4L, 1120, -23.5530, -46.6315))
    def run(order: Seq[KeyedPosition], name: String): Set[Seq[Any]] = {
      val input = MemoryStream[KeyedPosition](spark)
      val query = hopsStreamKeyed(input.toDS(), SpeedConf())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(order)
        query.processAllAvailable()
        spark.table(name).collect().map(_.toSeq).toSet
      } finally query.stop()
    }
    val fwd = run(tied, "keyed_fwd")
    val rev = run(tied.reverse, "keyed_rev")
    assert(fwd == rev, s"arrival order leaked into keyed results: $fwd vs $rev")

    val batchInput = tied.toDF()
      .withColumn("letreiro", lit("X")).withColumn("codigo_linha", lit(1))
      .withColumn("sentido_linha", lit(1)).withColumn("destino_linha", lit("D"))
      .withColumn("origem_linha", lit("O")).withColumn("acessibilidade", lit(true))
    val batch = SpeedPipeline.hops(batchInput, SpeedConf(), Seq($"event_id"))
      .select($"prefixo_veiculo", $"event_id", $"timestamp", $"tempo",
        $"distancia", $"velocidade_media")
      .collect().map(_.toSeq).toSet
    assert(fwd == batch, s"keyed streamed=$fwd batch=$batch")
    // tie row (event_id=3, tempo=0) dropped; hops land on ids 2 and 4
    assert(fwd.map(_(1)) == Set(2L, 4L))
  }

  test("file-source streaming EP2→EP3: raw JSON zone drives the stateful pipeline") {
    val dir = scratchDir("stream-raw")
    def poll(name: String, ts: String, p: String, py: Double): Unit =
      java.nio.file.Files.writeString(dir.resolve(name),
        s"""{"hr": "x", "l": [{"c": "L1", "cl": 1, "sl": 1, "lt0": "A", "lt1": "B",
           | "vs": [{"p": "$p", "a": true, "ta": "$ts", "py": $py, "px": -46.63}]}]}"""
          .stripMargin)
    poll("p1.json", "2025-03-06T10:00:00Z", "9001", -23.5500)
    poll("p2.json", "2025-03-06T10:01:00Z", "9001", -23.5505)
    val stream = hopsStream(
      StreamingSpeeds.positionsFromRawZone(spark, dir.toString), SpeedConf())
    val query = stream.writeStream.format("memory").queryName("file_hops")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val first = spark.table("file_hops").collect()
      assert(first.length == 1, s"two obs → one hop, got ${first.length}")
      // a third poll file arrives later → incremental discovery, state carries
      poll("p3.json", "2025-03-06T10:02:30Z", "9001", -23.5512)
      query.processAllAvailable()
      assert(spark.table("file_hops").count() == 2)
    } finally query.stop()
  }

  test("windowed streaming aggregate produces 30-min per-vehicle sums") {
    val input = MemoryStream[Position](spark)
    val agg = windowedSpeedAgg(hopsStream(input.toDS(), SpeedConf()))
    val query = agg.writeStream.format("memory").queryName("agg_out")
      .outputMode("append").start()
    try {
      input.addData(positions)
      query.processAllAvailable()
      // append-mode windows only emit once the watermark passes; the
      // watermark rides on emitted HOPS, so push two close late events
      // (the pair yields a hop carrying the late event time)
      input.addData(Position("A", 100000, -23.6000, -46.7000))
      input.addData(Position("A", 100100, -23.6001, -46.7001))
      query.processAllAvailable()
      val rows = spark.table("agg_out").collect()
      assert(rows.nonEmpty, "closed 30-min windows must be emitted")
      rows.foreach { r =>
        val d = r.getAs[Double]("distancia")
        val t = r.getAs[Long]("tempo")
        assert(r.getAs[Double]("velocidade_media") == d / t)
      }
    } finally query.stop()
  }
}
