package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc SQL-over-HTTP surface, driven end-to-end through a real
  * socket: register fixture views, start the gateway on an ephemeral
  * port, speak HTTP at it like a dashboard would. */
class SqlGatewaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer[A](f: Int => A): A = {
    SqlGateway.register(spark, TestSpark.Sf0001)
    val server = SqlGateway.serve(spark, 0)
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  private def http(port: Int, path: String, method: String,
                   body: Option[String]): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(stream.readAllBytes(), UTF_8)
    conn.disconnect()
    (status, text)
  }

  test("health, ad-hoc aggregate, custom function, limit cap, and SQL errors") {
    withServer { port =>
      val (hs, hb) = http(port, "/health", "GET", None)
      assert(hs == 200 && hb.contains("\"ok\""))

      // an aggregate the compiled registry does NOT contain — the whole
      // point of the gateway; verified against a direct computation
      val expected = Tables.events(spark, TestSpark.Sf0001).count()
      val (s1, b1) = http(port, "/sql", "POST",
        Some("SELECT count(*) AS n FROM events"))
      assert(s1 == 200, b1)
      assert(b1.trim == s"""{"n":$expected}""")

      // the codegen'd custom expressions are callable from plain SQL
      val (s2, b2) = http(port, "/sql", "POST",
        Some("SELECT distinct_ngram_count('a b c d', 2) AS g"))
      assert(s2 == 200, b2)
      assert(b2.trim == """{"g":3}""")

      // limit bounds what reaches the driver
      val (s3, b3) = http(port, "/sql?limit=5", "POST",
        Some("SELECT event_id FROM events"))
      assert(s3 == 200)
      assert(b3.trim.linesIterator.size == 5)

      // a malformed limit degrades to the default instead of hanging
      val (s3b, b3b) = http(port, "/sql?limit=bogus", "POST",
        Some("SELECT 1 AS one"))
      assert(s3b == 200, b3b)
      assert(b3b.trim == """{"one":1}""")

      // malformed SQL comes back as a 400 with the analyzer's message
      val (s4, b4) = http(port, "/sql", "POST",
        Some("SELECT FROM nowhere"))
      assert(s4 == 400, b4)
      assert(b4.contains("error"))

      // derived clicks view carries the reference-role columns
      val (s5, b5) = http(port, "/sql", "POST",
        Some("SELECT count(DISTINCT country) AS c FROM clicks"))
      assert(s5 == 200, b5)
      assert(b5.trim == """{"c":8}""")

      // concurrent readers share the one session: fire parallel queries
      // with distinct answers and check nothing cross-talks
      val futures = (0 until 8).map { i =>
        java.util.concurrent.CompletableFuture.supplyAsync(() =>
          http(port, "/sql", "POST",
            Some(s"SELECT $i AS i, count(*) AS n FROM events WHERE user_id % 8 = $i")))
      }
      futures.zipWithIndex.foreach { case (f, i) =>
        val (st, body) = f.get(60, java.util.concurrent.TimeUnit.SECONDS)
        assert(st == 200, body)
        assert(body.contains(s""""i":$i,"""), s"cross-talk for $i: $body")
      }

      // /explain returns the formatted physical plan without executing
      val (s6, b6) = http(port, "/explain", "POST",
        Some("SELECT n_name, count(*) AS n FROM customer " +
             "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1"))
      assert(s6 == 200, b6)
      assert(b6.contains("== Physical Plan =="), b6)
      assert(b6.contains("BroadcastHashJoin"), // nation is dimension-sized
        "expected a broadcast join in the ad-hoc plan:\n" + b6)
    }
  }
}
