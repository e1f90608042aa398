package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The LIVE execution layer around [[JsonIngest]]'s pure fetch
  * decisions — the reference's requests-session loops
  * (weather.py:423-739, productivity.py:99-146) re-expressed for
  * Spark's topology:
  *
  *  - CREDENTIAL concerns (API-key rotation on auth/quota, the KMA
  *    envelope codes 22/99) are DRIVER-side: [[fetchWithRotation]]
  *    probes the endpoint once with the key ring, settling on a
  *    working key before any cluster fan-out — a quota flip mid-job
  *    fails the batch loudly instead of half-fetching with a dead
  *    key from 1000 executors.
  *  - VOLUME concerns (one request per farm/grid/period) are
  *    EXECUTOR-side: [[fetchPartitioned]] maps the request table
  *    through per-partition HTTP clients with bounded per-request
  *    retry — the reference's driver thread pool becomes ordinary
  *    partition parallelism, and the response rows feed the same
  *    hash-verified parsers (parseKma / parseProductivity / ...).
  *
  * Everything policy-shaped (when to rotate, when to retry) stays in
  * [[JsonIngest.shouldRotateKey]]/[[JsonIngest.shouldRetry]] — this
  * file only executes those decisions. Backoff and clock are
  * injectable so the specs drive the full loop against an in-process
  * HTTP server with zero sleeps. */
object HttpFetch {

  /** Terminal outcome of a driver-side rotation probe. */
  final case class FetchOk(status: Int, body: String, keyIndex: Int,
                           attempts: Int)
  final case class FetchFailed(reason: String, lastStatus: Int,
                               attempts: Int)

  /** KMA envelope header probe: the resultCode of a 2xx body, without
    * a full Spark parse (that happens downstream on the fetched
    * frame). Absent on non-envelope bodies. */
  def resultCodeOf(body: String): Option[String] =
    """"resultCode"\s*:\s*"(\d+)"""".r.findFirstMatchIn(body).map(_.group(1))

  /** GET `urlForKey(key)` trying the key ring in order: transient
    * statuses (5xx/408) retry the SAME key with exponential backoff,
    * auth/quota outcomes (401/403/429, envelope 22/99) ROTATE to the
    * next key immediately, success returns, anything else fails
    * permanently — exactly the [[JsonIngest]] decision table,
    * executed. `maxAttempts` bounds total HTTP calls; exhausting the
    * ring or the budget is a loud failure (the reference's
    * all-keys-exhausted abort, api_key_manager.py:40). */
  def fetchWithRotation(urlForKey: String => String, keys: Seq[String],
                        maxAttempts: Int = 8,
                        client: HttpClient = defaultClient,
                        sleepMs: Long => Unit = Thread.sleep(_)
                       ): Either[FetchFailed, FetchOk] = {
    require(keys.nonEmpty, "empty key ring")
    var keyIndex = 0
    var attempts = 0
    var retriesOnKey = 0
    var lastStatus = -1
    while (attempts < maxAttempts && keyIndex < keys.size) {
      val (status, body) = get(client, urlForKey(keys(keyIndex)))
      attempts += 1
      lastStatus = status
      val code = if (status / 100 == 2) resultCodeOf(body) else None
      val success = status / 100 == 2 && code.forall(_ == "00")
      if (success) return Right(FetchOk(status, body, keyIndex, attempts))
      else if (JsonIngest.shouldRotateKey(status, code)) {
        keyIndex += 1; retriesOnKey = 0
      } else if (JsonIngest.shouldRetry(status, code)) {
        sleepMs(100L << math.min(retriesOnKey, 6)); retriesOnKey += 1
      } else {
        return Left(FetchFailed(
          s"permanent failure (status $status, code $code)", status, attempts))
      }
    }
    Left(FetchFailed(
      if (keyIndex >= keys.size) "all API keys exhausted"
      else "attempt budget exhausted", lastStatus, attempts))
  }

  /** Executor-side fan-out: fetch every row's `urlCol` with bounded
    * same-request retry (5xx/408, exponential backoff), appending
    * (http_status, body) — status and body always describe the same
    * LAST attempt: a received response keeps its body, INCLUDING a
    * final-attempt 5xx page (a 404/400/500 diagnostic envelope is
    * data: the KMA result codes ride in non-2xx bodies, and
    * downstream must be able to tell "server answered with an error"
    * from "connection never succeeded"); a connect/read failure
    * yields (-1, null) even when an EARLIER attempt had answered —
    * a stale body must never ride with status -1. Never a task
    * failure (the per-farm try/except of
    * productivity.py:99-146; the completeness gate downstream decides
    * whether the batch stands). One HttpClient per PARTITION (socket
    * reuse), `politenessMs` between requests inside a partition so a
    * 1000-task fan-out cannot hammer the upstream API beyond
    * partitions-per-politeness rate. Key rotation deliberately does
    * NOT happen here — settle the credential driver-side with
    * [[fetchWithRotation]] first, then fan out the working key. */
  def fetchPartitioned(requests: DataFrame, urlCol: String,
                       maxRetries: Int = 2, politenessMs: Long = 0L,
                       timeoutSec: Int = 30): DataFrame = {
    val inSchema = requests.schema
    val outSchema = StructType(inSchema.fields.toSeq :+
      StructField("http_status", IntegerType) :+
      StructField("body", StringType))
    val urlIdx = inSchema.fieldIndex(urlCol)
    requests.mapPartitions { rows =>
      lazy val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()
      rows.map { r =>
        val url = r.getString(urlIdx)
        var status = -1
        var body: String = null
        var attempt = 0
        var done = false
        while (!done && attempt <= maxRetries) {
          if (attempt > 0) Thread.sleep(100L << math.min(attempt - 1, 6))
          try {
            val (s, b) = get(client, url)
            status = s
            body = b // every received body is kept; retry may replace it
            if (!(s >= 500 || s == 408)) done = true
          } catch {
            // connect/read failure: void BOTH fields — status and body
            // must describe the same (last) attempt, so a stale 5xx
            // body from an earlier attempt never rides with status -1
            case _: java.io.IOException => status = -1; body = null
          }
          attempt += 1
        }
        if (politenessMs > 0) Thread.sleep(politenessMs)
        Row.fromSeq(r.toSeq :+ status :+ body)
      }
    }(Encoders.row(outSchema))
  }

  private def get(client: HttpClient, url: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
}
