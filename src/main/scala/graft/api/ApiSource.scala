package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL → DataFrame adapter for the survey-listing API (SURVEY.md §2.1 S9).
  *
  * The reference pages through the DHS REST API with `requests.get(...)
  * .json()` (ref 01_Check_For_Survey_Updates.ipynb:196-197): each page is a
  * JSON object carrying a data array and the total page count. This engine
  * never opens sockets itself (the harness has zero egress, and an analytics
  * library should not hard-wire a transport anyway) — the HTTP layer is an
  * injected [[ApiSource.Transport]] function. Production wires
  * `java.net.http`/requests there; offline runs and tests wire
  * [[fileTransport]] (URL → cached response file), which is exactly the
  * reference's own cache-to-Postgres fallback posture.
  *
  * Scale note: listings are API-sized (hundreds of rows). Fetch happens on
  * the driver; parsing/flattening is a Spark json read so the result plugs
  * into [[SurveyUpdates]] joins like any other frame.
  */
object ApiSource {

  /** GET a URL, return the response body. */
  type Transport = String => String

  /** A definitive HTTP failure (4xx other than 429): retrying cannot help,
    * so [[httpTransport]] fails immediately. Typed — retry control flow
    * must never hinge on matching an exception-message string.
    */
  final class NonRetryableHttpException(val code: Int, url: String)
    extends java.io.IOException(
      s"API request failed (non-retryable): HTTP $code for $url")

  /** Fetch all pages of a paged JSON API and flatten the per-page data
    * arrays into one DataFrame (schema inferred across every page).
    *
    * The pager mirrors the reference: request page 1, read the total-pages
    * field, request the rest (`&page=N`), concatenate each page's
    * `dataField` array. `maxPages` bounds a lying server.
    */
  def fetchPaged(
      spark: SparkSession,
      baseUrl: String,
      transport: Transport,
      dataField: String = "Data",
      totalPagesField: String = "TotalPages",
      maxPages: Int = 1000): DataFrame = {
    def pageUrl(p: Int) =
      if (p == 1) baseUrl
      else if (baseUrl.contains("?")) s"$baseUrl&page=$p"
      else s"$baseUrl?page=$p"
    val first = transport(pageUrl(1))
    val totalPages = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(first).path(totalPagesField)
      if (node.isNumber) math.min(maxPages, math.max(1, node.asInt)) else 1
    }
    val bodies = first +: (2 to totalPages).map(p => transport(pageUrl(p)))
    import spark.implicits._
    spark.read.json(spark.createDataset(bodies))
      .select(explode(col(dataField)).as("_row"))
      .select(col("_row.*"))
  }

  /** Production HTTP transport on `java.net.http` (JDK 11+, no extra
    * dependency): GET with JSON accept header, per-request timeout, and
    * bounded exponential-backoff retries on transient failures (connect/IO
    * errors and 5xx/429 responses — the failure modes of a long-running
    * listing poll). Any other non-2xx status fails immediately: a 404/403
    * retried is a 404/403 slower. Mirrors the reference's
    * `requests.get(url).json()` call sites (ref 01.ipynb:196-197,
    * 03.ipynb:337) with the reliability wrapper a scheduled pipeline needs.
    *
    * Untestable in this CI (zero egress) — exercised by the
    * ignored-by-default integration case in ApiSourceSpec; the paging/
    * parsing logic above is transport-agnostic and fully tested through
    * [[fileTransport]].
    */
  def httpTransport(
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30),
      maxAttempts: Int = 4,
      initialBackoffMs: Long = 500L,
      headers: Map[String, String] = Map.empty): Transport = {
    require(maxAttempts >= 1)
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    url => {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(timeout)
        .header("Accept", "application/json")
        .GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val req = b.build()
      var attempt = 0
      var result: Option[String] = None
      var lastFailure: String = ""
      while (result.isEmpty && attempt < maxAttempts) {
        if (attempt > 0)
          Thread.sleep(initialBackoffMs * (1L << (attempt - 1)))
        attempt += 1
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString(
              java.nio.charset.StandardCharsets.UTF_8))
          val code = resp.statusCode()
          if (code >= 200 && code < 300) result = Some(resp.body())
          else if (code >= 500 || code == 429) lastFailure = s"HTTP $code"
          else throw new NonRetryableHttpException(code, url)
        } catch {
          case e: NonRetryableHttpException => throw e
          case e: java.io.IOException => lastFailure = e.toString
          case e: InterruptedException => Thread.currentThread().interrupt(); throw e
        }
      }
      result.getOrElse(throw new java.io.IOException(
        s"API request failed after $maxAttempts attempts: $lastFailure for $url"))
    }
  }

  /** Offline transport: resolve each URL to a response file under `root`,
    * named by [[cacheFileName]]. Pair with a separate download step (or the
    * reference's manual cache) so the engine-side dataflow is identical
    * online and offline.
    */
  def fileTransport(root: String): Transport = url =>
    new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, cacheFileName(url))),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Deterministic filesystem-safe cache name for a URL: scheme stripped,
    * every non [A-Za-z0-9._-] run collapsed to '_', ".json" appended.
    */
  def cacheFileName(url: String): String =
    url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
      .replaceAll("[^A-Za-z0-9._-]+", "_") + ".json"
}
