package graft.sources

import java.net.{CookieManager, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Instant, ZoneOffset}

/** S1 twin — the one reference file with no engine counterpart until
  * now (get-bus-data.py): a cookie-authenticated REST poller for the
  * SPTrans Olho Vivo positions API that lands each raw snapshot into
  * the Hive-partitioned raw zone IngestPositions reads.
  *
  * Faithful to the reference's protocol:
  *  - auth: POST `Login/Autenticar?token=<key>` and keep the session
  *    cookie; success is HTTP 200 (get-bus-data.py:11–24).
  *  - fetch: GET `Posicao` on the authenticated session
  *    (get-bus-data.py:56–59).
  *  - landing key: `posicoes/year=Y/month=MM/day=DD/hour=HH/` +
  *    `data_yyyy-MM-dd'T'HH-mm-ss-UTC-0.json` — k=v path segments,
  *    i.e. Hive partitioning (get-bus-data.py:63–65), which is what
  *    makes the ingestion's day-prefix read a pruned partition scan.
  *
  * Deliberately NOT faithful: the secret comes in as a constructor
  * argument (the reference's SSM fetch, get-bus-data.py:6–9, is a
  * config concern — SURVEY §2.1 scopes secret SOURCING out of the
  * engine), and the landing write goes through the Hadoop FileSystem
  * API so the same code lands to file://, hdfs:// or an object store
  * depending on the zone URI — the raw BODY is written byte-for-byte,
  * preserving the reference's one-raw-file-per-poll granularity that
  * per-file corrupt isolation (F2) depends on.
  */
class OlhoVivoClient(
    baseUrl: String,
    apiKey: String,
    http: HttpClient = OlhoVivoClient.newSessionHttp()) {

  private def uri(path: String): URI = URI.create(s"$baseUrl/$path")

  /** POST Login/Autenticar?token=…; the client's CookieHandler retains
    * the session cookie for subsequent requests. The reference checks
    * HTTP 200 only (get-bus-data.py:22) — but the live API answers 200
    * with body "false" for an invalid token, so that check alone lets a
    * bad key "pass" auth and surface later as a confusing Posicao
    * failure. Checking the body too makes a bad key fail HERE, at the
    * auth seam. */
  def authenticate(): Boolean = {
    val req = HttpRequest.newBuilder(uri(s"Login/Autenticar?token=$apiKey"))
      .POST(HttpRequest.BodyPublishers.noBody()).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() == 200 && resp.body().trim == "true"
  }

  /** GET Posicao on the authenticated session; the raw JSON body.
    * Loud on non-200 — a silent empty snapshot would read as "no buses
    * running" downstream. */
  def fetchPositions(): String = {
    val req = HttpRequest.newBuilder(uri("Posicao")).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"Posicao returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** One poll cycle: authenticate, fetch, land the raw body under
    * `zoneRoot/<landingKey(now)>`. Returns the landed path. */
  def pollOnce(zoneRoot: String, now: Instant,
               hadoopConf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration()): String = {
    if (!authenticate())
      throw new IllegalStateException("Olho Vivo authentication failed")
    val body = fetchPositions()
    val path = s"$zoneRoot/${OlhoVivoClient.landingKey(now)}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, /* overwrite = */ false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    path
  }

  /** [[pollOnce]] on a fixed interval — the reference's cron cadence
    * (get-bus-data.py is scheduled externally; this makes the poller a
    * self-contained process that composes with the streaming ingestion:
    * each landed snapshot is discovered incrementally by
    * StreamingSpeeds.positionsFromRawZone over the same zone). `clock`
    * and `sleep` are injectable so tests drive a fake timeline with
    * zero wall-clock wait. Returns the landed paths in poll order.
    *
    * Fault isolation mirrors the reference's OPERATIONAL behavior, not
    * its code: EventBridge reschedules get-bus-data.py every minute
    * regardless of the previous invocation's outcome, so one failed
    * poll loses one snapshot, never the cadence. A failed iteration
    * here is logged via `onError` and skipped (no landed path); the
    * loop keeps its schedule, and the next iteration re-authenticates
    * as every poll does — a mid-loop session expiry heals itself
    * (F2's per-file error-isolation posture, applied at the source). */
  def pollLoop(zoneRoot: String, polls: Int, intervalMillis: Long,
               clock: () => Instant = () => Instant.now(),
               sleep: Long => Unit = Thread.sleep,
               hadoopConf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration(),
               onError: (Int, Throwable) => Unit = (i, e) =>
                 System.err.println(s"[olhovivo] poll $i failed, skipping: ${e.getMessage}")): Seq[String] =
    (1 to polls).flatMap { i =>
      val landed =
        try Some(pollOnce(zoneRoot, clock(), hadoopConf))
        catch { case scala.util.control.NonFatal(e) =>
          onError(i, e)
          None
        }
      if (i < polls) sleep(intervalMillis)
      landed
    }
}

object OlhoVivoClient {

  /** An HttpClient with a cookie jar — the API authenticates the
    * SESSION via cookie, not per-request headers, so the handler is
    * load-bearing (mirrors requests.Session in the reference). */
  def newSessionHttp(): HttpClient =
    HttpClient.newBuilder().cookieHandler(new CookieManager()).build()

  /** get-bus-data.py:63–65's key, exactly:
    * `posicoes/year=Y/month=MM/day=DD/hour=HH/data_%Y-%m-%dT%H-%M-%S-UTC-0.json`
    * (UTC clock, zero-padded month/day/hour, dashes in the time part
    * so the filename stays filesystem-safe). */
  def landingKey(now: Instant): String = {
    val t = now.atOffset(ZoneOffset.UTC)
    f"posicoes/year=${t.getYear}/month=${t.getMonthValue}%02d/" +
      f"day=${t.getDayOfMonth}%02d/hour=${t.getHour}%02d/" +
      f"data_${t.getYear}-${t.getMonthValue}%02d-${t.getDayOfMonth}%02dT" +
      f"${t.getHour}%02d-${t.getMinute}%02d-${t.getSecond}%02d-UTC-0.json"
  }
}
