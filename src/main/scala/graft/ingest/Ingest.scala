package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side payload acquisition for the JSON-stat ingest — the fetch
  * layer of the reference's extraction script
  * (`scripts/extract_eurostat.py:79-117`: build the query URL, GET with a
  * timeout, raise on failure), kept OUT of the engine core: executors
  * never touch the network. The driver fetches small API payloads
  * (country × month grids), lands them in a (dataset_code, payload)
  * frame, and [[JsonStat.decode]] does the heavy decode distributed.
  *
  * The transport is an injectable [[Fetcher]]; `file://` URLs work
  * through the default [[UrlFetcher]] without network, which is what
  * IngestSpec drives (zero-egress environment — the HTTP path is the
  * same code minus the scheme).
  */
object Ingest {

  /** Minimal transport: GET a URL, return the body. Implementations
    * throw [[FetchException]] for protocol-level failures (carrying the
    * status when known) and plain IOExceptions for transport failures.
    */
  trait Fetcher {
    def get(url: String, timeoutMillis: Int): String
  }

  /** HTTP/file transport over `java.net.URL` — connect AND read timeouts
    * both bound by `timeoutMillis` (the reference's
    * `requests.get(timeout=60)` discipline: a hung socket must not hang
    * the extraction).
    */
  final class UrlFetcher extends Fetcher {
    def get(url: String, timeoutMillis: Int): String = {
      val conn = new java.net.URL(url).openConnection()
      conn.setConnectTimeout(timeoutMillis)
      conn.setReadTimeout(timeoutMillis)
      conn match {
        case http: java.net.HttpURLConnection =>
          val status = http.getResponseCode
          if (status >= 400) {
            // disconnect before throwing so the retry loop can't
            // accumulate half-open sockets (one per attempt). disconnect
            // closes the underlying connection outright, so draining the
            // error body for keep-alive reuse would be wasted I/O —
            // retries pay a fresh connect, which is the right trade for
            // an ERROR path (error bodies can be arbitrarily large)
            http.disconnect()
            throw new FetchException(s"GET $url failed: HTTP $status", status)
          }
        case _ => // file:// etc. — no status channel, failures are IO
      }
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    }
  }

  final class FetchException(msg: String, val status: Int)
      extends java.io.IOException(msg) {
    /** 5xx and 429 are transient server states worth retrying; other
      * HTTP failures (404, 403, 400) are permanent for a given URL.
      */
    def retriable: Boolean = status >= 500 || status == 429
  }

  /** Query URL for one dataset: `format=JSON&lang=en` plus the dataset
    * params, LIST params repeated (`extract_eurostat.py:93-105` —
    * `geo=DE&geo=FR&...`), values URL-encoded.
    */
  def buildUrl(base: String, datasetCode: String,
               params: Seq[(String, String)]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val qs = (Seq("format" -> "JSON", "lang" -> "en") ++ params)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }
      .mkString("&")
    s"$base/${enc(datasetCode)}?$qs"
  }

  /** GET with bounded retries and exponential backoff. Transport errors
    * (timeouts, connection resets) and retriable HTTP states retry up to
    * `maxAttempts`; permanent HTTP failures propagate immediately. The
    * sleeper is injectable so the spec covers the backoff schedule
    * without real waits.
    */
  def fetchWithRetry(
      fetcher: Fetcher,
      url: String,
      timeoutMillis: Int = 60000,
      maxAttempts: Int = 3,
      backoffMillis: Long = 1000,
      sleep: Long => Unit = Thread.sleep): String = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 1
    while (true) {
      try return fetcher.get(url, timeoutMillis)
      catch {
        case e: FetchException if !e.retriable => throw e
        case e: java.io.IOException =>
          if (attempt >= maxAttempts)
            throw new java.io.IOException(
              s"GET $url failed after $maxAttempts attempts: ${e.getMessage}", e)
          // 1x, 2x, 4x, … with the shift clamped: a large maxAttempts
          // would overflow `<<` to a negative sleep and crash a
          // retriable failure (round-7 advice).
          sleep(backoffMillis * (1L << math.min(attempt - 1, 20)))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Driver-side ingest of several datasets into the (dataset_code,
    * payload) frame [[JsonStat.decode]] consumes. Payload count = dataset
    * count (a handful of small API grids — driver-sized by construction;
    * the decode fan-out to rows happens distributed).
    */
  def fetchDatasets(
      spark: SparkSession,
      fetcher: Fetcher,
      base: String,
      datasets: Map[String, Seq[(String, String)]],
      timeoutMillis: Int = 60000,
      maxAttempts: Int = 3): DataFrame = {
    import spark.implicits._
    datasets.toSeq.sortBy(_._1).map { case (code, params) =>
      val url = buildUrl(base, code, params)
      code -> fetchWithRetry(fetcher, url, timeoutMillis, maxAttempts)
    }.toDF("dataset_code", "payload")
  }
}
