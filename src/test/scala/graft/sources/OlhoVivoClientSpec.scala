package graft.sources

import java.net.InetSocketAddress
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.olhovivo.{Schemas, SparkTestBase}

/** The S1 REST-client twin against a local HTTP stub that enforces the
  * reference's protocol: cookie-session auth via
  * `Login/Autenticar?token=`, then GET `Posicao` honored only WITH the
  * session cookie. */
class OlhoVivoClientSpec extends SparkTestBase {

  private val Token = "test-api-key-123"
  private val Payload =
    """{"hr":"12:30","l":[{"c":"5015-10","cl":33887,"sl":1,"lt0":"TERM A","lt1":"TERM B",
      |"vs":[{"p":"68091","a":true,"ta":"2024-05-01T15:30:10Z","py":-23.55,"px":-46.63},
      |{"p":"68092","a":false,"ta":"2024-05-01T15:30:12Z","py":-23.56,"px":-46.64}]}]}"""
      .stripMargin.replace("\n", "")

  /** Stub API: /v2.1/Login/Autenticar?token=<Token> → 200 + session
    * cookie; /v2.1/Posicao → 200 + payload iff the cookie came back,
    * 401 otherwise; wrong token → 401. */
  private def withStub[A](body: (String, () => Int) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var posicaoHits = 0
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
        if (cookies.contains("apiCredentials=sess-xyz")) {
          posicaoHits += 1
          respond(ex, 200, Payload)
        } else respond(ex, 401, "no session")
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v2.1", () => posicaoHits)
    finally server.stop(0)
  }

  test("authenticate: 200 with the right token, refused otherwise") {
    withStub { (base, _) =>
      assert(new OlhoVivoClient(base, Token).authenticate())
      assert(!new OlhoVivoClient(base, "wrong-token").authenticate())
    }
  }

  test("authenticate: HTTP 200 with body 'false' (invalid key) fails at the auth seam") {
    // the live API answers 200 + "false" for a bad token — status alone
    // would let the bad key through to a confusing Posicao failure
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v2.1/Login/Autenticar", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = "false".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        try ex.getResponseBody.write(bytes) finally ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v2.1"
      assert(!new OlhoVivoClient(base, "expired-key").authenticate())
    } finally server.stop(0)
  }

  test("fetchPositions without auth is rejected loudly (cookie is load-bearing)") {
    withStub { (base, _) =>
      val ex = intercept[IllegalStateException] {
        new OlhoVivoClient(base, Token).fetchPositions()
      }
      assert(ex.getMessage.contains("401"), ex.getMessage)
    }
  }

  test("landingKey mirrors the reference's partitioned key exactly") {
    // get-bus-data.py:63-65: k=v segments, zero-padded, UTC stamp
    val key = OlhoVivoClient.landingKey(Instant.parse("2024-05-01T08:30:09Z"))
    assert(key ==
      "posicoes/year=2024/month=05/day=01/hour=08/data_2024-05-01T08-30-09-UTC-0.json")
  }

  test("pollOnce lands the raw body at the partitioned key; the zone is ingestible") {
    withStub { (base, hits) =>
      val zone = scratchDir("olhovivo-zone").toString
      val now = Instant.parse("2024-05-01T08:30:09Z")
      val landed = new OlhoVivoClient(base, Token).pollOnce(zone, now)
      assert(landed.endsWith(
        "posicoes/year=2024/month=05/day=01/hour=08/data_2024-05-01T08-30-09-UTC-0.json"))
      assert(hits() == 1)
      // the body landed byte-for-byte (raw-zone contract: per-file
      // corrupt isolation needs the original file granularity)
      val onDisk = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(landed)), "UTF-8")
      assert(onDisk == Payload)
      // and the zone is readable by the ingestion's schema-enforced scan
      val parsed = IO.readJson(spark, Schemas.rawSnapshot, landed)
      val vehicles = parsed.select(explode(col("l")).as("line"))
        .select(explode(col("line.vs")).as("v"))
      assert(vehicles.count() == 2)
      assert(vehicles.select(col("v.p")).collect().map(_.getString(0)).toSet ==
        Set("68091", "68092"))
      // a second poll in the same second must not silently clobber the
      // landed file (FileSystem.create with overwrite = false)
      intercept[Exception] {
        new OlhoVivoClient(base, Token).pollOnce(zone, now)
      }
    }
  }
}
