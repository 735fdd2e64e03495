package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Http

/**
 * Live HTTP enrichment round-trip against a loopback server (the sandbox has
 * zero egress; the reference's HTTPRequest is a fetch-and-forward processor,
 * so loopback exercises the full code path).
 */
class HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HTTPRequest analogue: fetch JSON lines, broadcast-enrich a table") {
    val body = (1 to 5).map(i => s"""{"code":$i,"label":"dim_$i"}""").mkString("\n")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dims", exchange => {
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/dims"
      val dims = Http.fetchJsonLines(spark, url)
      assert(dims.count() == 5)
      assert(dims.columns.sorted.toSeq == Seq("code", "label"))
      // the enrichment join: fetched payload is small by construction -> broadcast
      val facts = (1 to 100).map(i => (i.toLong, (i % 5) + 1)).toDF("id", "code")
      val joined = facts.join(broadcast(dims), "code")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast enrich:\n$plan")
      assert(joined.filter(col("label") === "dim_3").count() == 20)
    } finally server.stop(0)
  }

  test("correlated per-payload fetch: a prior result drives one request per key") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // /items?code=N -> 3 JSON lines for that code
    server.createContext("/items", exchange => {
      val code = exchange.getRequestURI.getQuery.stripPrefix("code=").toInt
      val body = (1 to 3)
        .map(i => s"""{"code":$code,"item":"it_${code}_$i"}""").mkString("\n")
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // the prior result: top-2 codes of a local aggregation
      val hot = (1 to 100).map(i => (i.toLong, (i % 3) + 1)).toDF("id", "code")
        .groupBy("code").count().orderBy(col("count").desc, col("code"))
        .limit(2).collect().map(_.getAs[Int]("code")).toSeq
      assert(hot.size == 2)
      val items = Http.fetchCorrelated(spark, hot)(c => s"$base/items?code=$c")
      assert(items.count() == 6) // 2 correlated requests x 3 lines
      assert(items.select("code").distinct().count() == 2)
      assert(items.columns.sorted.toSeq == Seq("code", "item"))
    } finally server.stop(0)
  }

  test("paged fetch unions pages until the server runs dry") {
    val all = (0 until 25).map(i => s"""{"n":$i}""")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/page", exchange => {
      val p = exchange.getRequestURI.getQuery.stripPrefix("p=").toInt
      val body = all.slice(p * 10, (p + 1) * 10).mkString("\n")
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val df = Http.fetchPaged(spark)(i => s"$base/page?p=$i")
      assert(df.count() == 25) // 3 pages: 10 + 10 + 5, stops on empty page 3
      assert(df.agg(sum(col("n"))).head().getLong(0) == (0 until 25).sum.toLong)
      // unbounded server trips the page bound instead of looping forever
      server.createContext("/inf", exchange => {
        val bytes = """{"x":1}""".getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      val ex = intercept[IllegalArgumentException](
        Http.fetchPaged(spark, maxPages = 5)(_ => s"$base/inf"))
      assert(ex.getMessage.contains("did not terminate"))
      // boundary: a corpus with EXACTLY maxPages non-empty pages terminates
      // legitimately (the empty terminating page is observable past the cap)
      val exact = Http.fetchPaged(spark, maxPages = 3)(i => s"$base/page?p=$i")
      assert(exact.count() == 25)
    } finally server.stop(0)
  }
}
