package graft.streaming

import java.net.InetSocketAddress
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.olhovivo.SparkTestBase
import graft.olhovivo.SpeedPipeline.SpeedConf
import graft.sources.OlhoVivoClient
import StreamingSpeeds._

/** The reference system end to end as ONE live loop: the REST poller
  * (S1) lands raw snapshots into the Hive-partitioned zone on an
  * interval, and the streaming EP2→EP3 path picks each one up
  * incrementally — landing zone → schema-enforced flatten → stateful
  * hops → watermarked 30-min aggregate. Closes the last
  * "pieces exist, loop unproven" seam: every stage here is the same
  * production code (`pollLoop`, `positionsFromRawZone`, `hopsStream`,
  * `windowedSpeedAgg`), only the HTTP API and the clock are stubs. */
class PollerStreamingSpec extends SparkTestBase {

  private val Token = "test-api-key-123"
  private val T0 = Instant.parse("2025-03-06T10:00:00Z")

  /** Stub API whose Posicao payload ADVANCES per authenticated hit:
    * hits 1..3 are one vehicle moving a minute apart (two clean hops);
    * hits ≥ 4 jump ~28 h ahead — the watermark push that lets the
    * append-mode window emit, exactly as a real next-day poll would. */
  private def withStub[A](body: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var hits = 0
    def respond(ex: HttpExchange, code: Int, text: String): Unit = {
      val bytes = text.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
    }
    server.createContext("/v2.1/Login/Autenticar", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val ok = ex.getRequestMethod == "POST" &&
          Option(ex.getRequestURI.getQuery).contains(s"token=$Token")
        if (ok) ex.getResponseHeaders.add("Set-Cookie", "apiCredentials=sess-xyz; Path=/")
        respond(ex, if (ok) 200 else 401, ok.toString)
      }
    })
    server.createContext("/v2.1/Posicao", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val cookies = Option(ex.getRequestHeaders.getFirst("Cookie")).getOrElse("")
        if (!cookies.contains("apiCredentials=sess-xyz")) respond(ex, 401, "no session")
        else {
          hits += 1
          val (tsSec, py) =
            if (hits <= 3) (T0.getEpochSecond + (hits - 1) * 60L,
              -23.5500 - (hits - 1) * 0.0005)
            else (T0.getEpochSecond + 100000L + (hits - 4) * 100L,
              -23.6000 - (hits - 4) * 0.0001)
          val ta = Instant.ofEpochSecond(tsSec).toString
          respond(ex, 200,
            s"""{"hr": "x", "l": [{"c": "L1", "cl": 1, "sl": 1, "lt0": "A",
               | "lt1": "B", "vs": [{"p": "68091", "a": true, "ta": "$ta",
               | "py": $py, "px": -46.63}]}]}""".stripMargin.replace("\n", ""))
        }
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v2.1")
    finally server.stop(0)
  }

  test("pollLoop isolates a failed poll: skip, keep cadence, land the rest") {
    // stub whose Posicao FAILS on exactly the 2nd authenticated hit —
    // the EventBridge operational contract: one lost snapshot, never a
    // lost cadence
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var hits = 0
    def respond(ex: HttpExchange, code: Int, text: String): Unit = {
      val bytes = text.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
    }
    server.createContext("/v2.1/Login/Autenticar", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.add("Set-Cookie", "apiCredentials=sess-xyz; Path=/")
        respond(ex, 200, "true")
      }
    })
    server.createContext("/v2.1/Posicao", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        hits += 1
        if (hits == 2) respond(ex, 500, "transient upstream error")
        else respond(ex, 200, """{"hr": "x", "l": []}""")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v2.1"
      val zone = scratchDir("poller-fault-zone").toString
      val client = new OlhoVivoClient(base, Token)
      var tick = 0
      def fakeClock(): Instant = { val t = T0.plusSeconds(60L * tick); tick += 1; t }
      var slept = 0
      val errors = Seq.newBuilder[(Int, String)]
      val landed = client.pollLoop(zone, polls = 3, intervalMillis = 60000,
        clock = fakeClock _, sleep = _ => slept += 1,
        onError = (i, e) => errors += ((i, e.getMessage)))
      // polls 1 and 3 landed; poll 2 skipped, reported, cadence kept
      assert(landed.length == 2, s"expected 2 landed files, got $landed")
      assert(landed.toSet.size == 2)
      val reported = errors.result()
      assert(reported.map(_._1) == Seq(2), s"poll 2 must be the failure: $reported")
      assert(reported.head._2.contains("500"))
      assert(slept == 2, "the schedule must tick between every poll, failed or not")
      assert(tick == 3, "every poll consumes its clock tick")
    } finally server.stop(0)
  }

  test("pollLoop on an interval drives landing zone → watermarked speeds live") {
    withStub { base =>
      val zone = scratchDir("poller-zone").toString
      val client = new OlhoVivoClient(base, Token)
      // fake timeline: one tick per poll, one poll minute apart — the
      // injectable clock/sleep seam, zero wall-clock wait
      var tick = 0
      def fakeClock(): Instant = { val t = T0.plusSeconds(60L * tick); tick += 1; t }
      val landed = client.pollLoop(zone, polls = 3, intervalMillis = 60000,
        clock = fakeClock _, sleep = _ => ())
      assert(landed.length == 3 && landed.toSet.size == 3)
      assert(landed.forall(_.contains("posicoes/year=2025/month=03/day=06/hour=10/")))

      // streaming EP2→EP3 over the PARTITIONED zone the poller landed to
      val zoneGlob = s"$zone/posicoes/year=*/month=*/day=*/hour=*"
      val hopsQuery = hopsStream(
        StreamingSpeeds.positionsFromRawZone(spark, zoneGlob), SpeedConf())
        .writeStream.format("memory").queryName("poller_hops")
        .outputMode("append").start()
      val aggQuery = windowedSpeedAgg(hopsStream(
        StreamingSpeeds.positionsFromRawZone(spark, zoneGlob), SpeedConf()))
        .writeStream.format("memory").queryName("poller_agg")
        .outputMode("append").start()
      try {
        hopsQuery.processAllAvailable()
        // 3 polled snapshots → 2 cleaned hops, a minute each
        val hops = spark.table("poller_hops").collect()
        assert(hops.length == 2, s"3 polls must yield 2 hops, got ${hops.length}")
        assert(hops.forall(_.getAs[Long]("tempo") == 60L))
        assert(hops.forall(_.getAs[String]("prefixo_veiculo") == "68091"))
        assert(hops.forall(_.getAs[Double]("velocidade_media") > 0))

        // two more interval polls (stub jumps ~28 h) → incremental
        // discovery advances the watermark past the first 30-min window
        client.pollLoop(zone, polls = 2, intervalMillis = 60000,
          clock = fakeClock _, sleep = _ => ())
        hopsQuery.processAllAvailable()
        aggQuery.processAllAvailable()
        val agg = spark.table("poller_agg")
          .filter(org.apache.spark.sql.functions.col("n_hops") === 2).collect()
        assert(agg.length == 1,
          s"the 10:00–10:30 window must emit one 2-hop row: ${agg.mkString(",")}")
        val r = agg.head
        assert(r.getAs[String]("prefixo_veiculo") == "68091")
        assert(r.getAs[Long]("tempo") == 120L)
        assert(r.getAs[Double]("velocidade_media") ==
          r.getAs[Double]("distancia") / r.getAs[Long]("tempo"))
      } finally { hopsQuery.stop(); aggQuery.stop() }
    }
  }
}
