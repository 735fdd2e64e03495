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
}
