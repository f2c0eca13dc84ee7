package graft.ingest

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Minimal HTTP-fetch abstraction with the reference's resilience policy
  * (SURVEY S1-S4): bounded retries with backoff on retryable statuses
  * (`tfl_ingest_dag.py:26-31`: Retry(total=3, backoff_factor=0.5, on
  * 429/500/502/503/504), 20 s timeout), per-element error isolation
  * (`tfl_align.py:201-210`).
  *
  * The transport is pluggable so the engine runs offline: production wires
  * `java.net.http.HttpClient`; tests and this zero-egress environment wire
  * a synthetic transport ([[SyntheticArrivals.transport]]). Fetching is a
  * DRIVER-side concern by design — a 2-minute poll of a handful of stops
  * (the reference's cadence) needs no distributed source; rows enter Spark
  * as a `Dataset` afterwards.
  */
object Http {

  final case class Response(status: Int, body: String)
  type Transport = String => Response

  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  final case class Policy(retries: Int = 3, backoffMillis: Long = 500,
      sleeper: Long => Unit = Thread.sleep)

  /** URL with its query string dropped — credentials ride as query params
    * (`app_id`/`app_key`), so anything user-facing (error messages, log
    * lines) must carry the redacted form or Config's "never logged"
    * contract breaks the moment a caller logs a failure. The path alone
    * still identifies the element.
    */
  def redact(url: String): String = {
    val q = url.indexOf('?')
    if (q < 0) url else url.substring(0, q) + "?<redacted>"
  }

  /** Only the credential param VALUES masked; every other query param
    * (pagination cursors, filters) survives, so the result is both safe to
    * log and still unique per request — the form [[fetchMany]] keys by.
    */
  private val credentialParams = Seq("app_id", "app_key")
  def redactCredentials(url: String): String =
    credentialParams.foldLeft(url)((u, p) =>
      u.replaceAll(s"(?<=[?&]$p=)[^&#]*", "***"))

  /** GET with retry/backoff; returns the body or the final failure. */
  def fetch(url: String, transport: Transport,
      policy: Policy = Policy()): Try[String] = {
    @tailrec def go(attempt: Int): Try[String] =
      Try(transport(url)) match {
        case Success(Response(200, body)) => Success(body)
        case Success(Response(code, _)) if RetryableStatuses(code) && attempt < policy.retries =>
          // urllib3-style exponential backoff: factor * 2^attempt
          policy.sleeper(policy.backoffMillis * (1L << attempt))
          go(attempt + 1)
        case Success(Response(code, _)) =>
          Failure(new RuntimeException(s"HTTP $code for ${redact(url)}"))
        case Failure(e) if attempt < policy.retries =>
          policy.sleeper(policy.backoffMillis * (1L << attempt))
          go(attempt + 1)
        case Failure(e) => Failure(e)
      }
    go(0)
  }

  /** Fan-out with per-element isolation: failures are logged-and-skipped,
    * never fatal (reference `tfl_ingest_dag.py:63-64`).
    *
    * Keyed by [[redactCredentials]] of the url: requests differing in any
    * non-credential query param (pagination pages) stay distinguishable,
    * while the key is structurally safe for a caller to log — the "never
    * logged" credential contract must not depend on every caller
    * remembering to redact. Caveat: two urls differing ONLY in credential
    * values collapse to the same key — acceptable, since such requests
    * target the same resource.
    */
  def fetchMany(urls: Seq[String], transport: Transport,
      policy: Policy = Policy()): Seq[(String, Try[String])] =
    urls.map(u => redactCredentials(u) -> fetch(u, transport, policy))
}
