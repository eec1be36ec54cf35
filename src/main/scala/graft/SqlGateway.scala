package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc SQL over HTTP — the reference's interactive read path.
  *
  * The reference serves ad-hoc SQL through ClickHouse's HTTP port
  * (:8123), which Superset/Grafana and `curl` consume (reference
  * `README.md:77`, `superset/README.md:37`); until now this repo's
  * query surface was the compiled registry only — an operator could not
  * type a NEW query at the engine without recompiling. This gateway
  * closes that gap the same way ClickHouse does:
  *
  *   POST /sql       body = raw SQL text → one JSON object per row
  *                   (the `FORMAT JSONEachRow` analogue), ?limit=N
  *                   caps the rows collected (default 10 000)
  *   POST /explain   body = raw SQL text → the formatted physical plan,
  *                   without executing (check pushdown/broadcast shape
  *                   before paying for the query)
  *   GET  /health    liveness probe
  *
  * Built on the JDK's own `com.sun.net.httpserver` — zero dependencies
  * beyond the JDK, same as the rest of the build.
  *
  * Scale posture: the SQL itself executes fully distributed (same
  * session, same Catalyst plans — the custom codegen'd expressions
  * `word_shingles`/`cosine_similarity`/... are registered, so ad-hoc
  * SQL has the same plan shapes as the compiled registry). Only the
  * RESULT crosses to the driver, explicitly bounded by `limit` via
  * `toJSON.take(n)` — `take` on the JSON-mapped dataset pulls partitions
  * incrementally, so `SELECT * FROM events` with limit=100 never
  * collects the corpus. An endpoint for human-sized answers, not a
  * bulk-export path — exports are the sinks' job.
  */
object SqlGateway {

  /** Register every fixture table as a temp view (+ the derived
    * `clicks` view and the custom SQL functions) so ad-hoc SQL sees the
    * same relations the registry queries build on. */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.TextKernels.register(spark)
    graft.functions.VectorFunctions.register(spark)
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.clicks(spark, dir).createOrReplaceTempView("clicks")
  }

  /** Execute `sql` and render ≤ `limit` rows as JSON lines. */
  def runToJsonLines(spark: SparkSession, sql: String, limit: Int): String =
    spark.sql(sql).toJSON.take(limit).mkString("", "\n", "\n")

  /** Formatted physical plan for `sql` WITHOUT executing it — the
    * `EXPLAIN`/`.explain("formatted")` surface over HTTP, so an operator
    * can check pushdown/broadcast/codegen shape before paying for a
    * query. */
  def explainSql(spark: SparkSession, sql: String): String =
    spark.sql(sql).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Start the gateway on `port` (0 = ephemeral; read the bound port
    * from the returned server). Call `.stop(0)` to shut down. */
  def serve(spark: SparkSession, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}""" + "\n"))

    server.createContext("/sql", (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST raw SQL to /sql"}""" + "\n")
      else {
        val sql = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
        // toIntOption: a malformed limit must degrade to the default, not
        // throw outside the handler's try and leave the client hanging
        val limit = Option(ex.getRequestURI.getQuery).toSeq
          .flatMap(_.split("&")).collectFirst {
            case p if p.startsWith("limit=") => p.stripPrefix("limit=")
          }.flatMap(_.toIntOption).filter(_ > 0).getOrElse(10000)
        if (sql.isEmpty) respond(ex, 400, """{"error":"empty query"}""" + "\n")
        else
          try respond(ex, 200, runToJsonLines(spark, sql, limit))
          catch { case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replace("\\", "\\\\").replace("\"", "\\\"")
              .replace("\n", "\\n").replace("\r", "").replace("\t", " ")
            respond(ex, 400, s"""{"error":"$msg"}""" + "\n")
          }
      }
    })

    server.createContext("/explain", (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST raw SQL to /explain"}""" + "\n")
      else {
        val sql = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
        val plain = (status: Int, body: String) => {
          val bytes = body.getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
          ex.sendResponseHeaders(status, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        try plain(200, explainSql(spark, sql))
        catch { case e: Throwable =>
          plain(400, Option(e.getMessage).getOrElse(e.getClass.getName)) }
      }
    })

    // small fixed pool: concurrent ad-hoc readers share the ONE Spark
    // session (thread-safe; jobs run FIFO through the scheduler)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server
  }

  /** `runMain graft.SqlGateway <sfDir> [port]` — register + serve until
    * killed. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8123)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    register(spark, dir)
    val server = serve(spark, port)
    println(s"graft SQL gateway on :${server.getAddress.getPort} " +
      s"(POST /sql, GET /health) over $dir")
    Thread.currentThread.join()
  }
}
