package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * HTTP ingestion — the reference's HTTPRequest processor
 * (/root/reference/processors/http_request.go:15-43: fire a request per
 * incoming payload, forward the response body downstream).
 *
 * Spark shape: HTTP fetch is a DRIVER-side act of acquisition (small control
 * metadata, auth, pagination), after which the payload enters the
 * distributed plan via `createDataset` + the standard JSON/CSV readers. Bulk
 * data should never flow through per-row HTTP from executors — that turns a
 * scan into N network round-trips with no pushdown, no retries under the
 * engine's control, and no lineage; land bulk payloads in object storage and
 * scan them instead.
 *
 * `fetchJsonLines` is the enrichment pattern: fetch a JSON-lines body, get a
 * DataFrame back (schema inferred or supplied), join it into the plan —
 * typically broadcast, since HTTP-sized payloads are by definition small.
 * Verified in HttpSpec against a loopback server (zero-egress sandbox).
 */
object Http {

  private lazy val client = HttpClient.newHttpClient()

  /** GET the body as a string (driver-side). */
  def fetchBody(url: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  /** GET a JSON-lines payload into a DataFrame (schema inferred). */
  def fetchJsonLines(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] =
      spark.createDataset(fetchBody(url).linesIterator.filter(_.nonEmpty).toSeq)
    spark.read.json(lines)
  }

  /**
   * Correlated per-payload fetch — the reference HTTPRequest's
   * one-request-per-incoming-payload loop
   * (/root/reference/processors/http_request.go:15-43) and the HTTP face of
   * its DynamicSQLReader templating: a driver-side key set (typically a
   * prior result's collected rows) generates one GET per key; the JSON-lines
   * responses union into a single DataFrame (schema inferred across pages).
   *
   * Driver-side on purpose: the key set is control-plane-sized by
   * construction (it was collected), and executor-side HTTP would turn a
   * scan into unmanaged network fan-out — see the object doc.
   */
  def fetchCorrelated[T](spark: SparkSession, keys: Seq[T])(
      urlFor: T => String): DataFrame = {
    import spark.implicits._
    val lines = keys.iterator
      .flatMap(k => fetchBody(urlFor(k)).linesIterator.filter(_.nonEmpty))
      .toSeq
    spark.read.json(spark.createDataset(lines))
  }

  /**
   * Page-indexed pagination (the reference BigQueryReader's page-size loop,
   * /root/reference/processors/big_query_reader.go:49, re-expressed over
   * HTTP): GET `pageUrl(0)`, `pageUrl(1)`, ... until a page returns an empty
   * body or `maxPages` is hit (a misbehaving server must not loop forever).
   * All pages' JSON lines union into one inferred-schema DataFrame.
   */
  def fetchPaged(spark: SparkSession, maxPages: Int = 1000)(
      pageUrl: Int => String): DataFrame = {
    import spark.implicits._
    // take(maxPages + 1), not maxPages: capping BEFORE the size check would
    // hide the terminating empty page of a corpus with exactly maxPages
    // non-empty pages — takeWhile must be allowed to observe it
    val pages = Iterator.from(0)
      .map(i => fetchBody(pageUrl(i)))
      .takeWhile(_.trim.nonEmpty)
      .take(maxPages + 1)
      .toSeq
    require(pages.size <= maxPages,
      s"pagination did not terminate within $maxPages pages")
    val lines = pages.iterator.flatMap(_.linesIterator).filter(_.nonEmpty).toSeq
    spark.read.json(spark.createDataset(lines))
  }
}
