package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Executes the production JDBC sink (`ClickPipeline.jdbcBatchWriter`,
  * StreamJob.java:283-329 parity) against a REAL database — embedded
  * Derby, which ships with the Spark distribution — rather than leaving
  * the branch compile-only. Covers: table auto-creation, multi-batch
  * streamed appends through foreachBatch, ingest-time stamping,
  * at-least-once append semantics, and the bounded-retry failure path
  * with the suppressed-cause chain. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def props = new java.util.Properties()

  test("A12 JDBC flavor: streamed micro-batches land in a real database") {
    val url = "jdbc:derby:memory:graft_jdbc_e2e;create=true"
    val input = MemoryStream[(String, String, Long)](spark)
    val df = input.toDF().toDF("event_id", "page", "cnt")
    val q = df.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck_jdbc").toString)
      .foreachBatch(ClickPipeline.jdbcBatchWriter(url, "clicks_agg", props,
        batchSize = 100, maxRetries = 3))
      .start()
    try {
      input.addData(("e1", "/", 3L), ("e2", "/cart", 5L))
      q.processAllAvailable()
      input.addData(("e3", "/", 7L))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.jdbc(url, "clicks_agg", props)
    assert(back.count() == 3, "all rows across micro-batches must be appended")
    // B8: the sink stamps ingest time, and it reads back non-null
    assert(back.filter(col("created_at").isNull).count() == 0)
    assert(back.select("event_id").as[String].collect().toSet == Set("e1", "e2", "e3"))
    val cnts = back.select("page", "cnt").as[(String, Long)].collect().toMap
    assert(cnts("/cart") == 5L)
  }

  test("A12 JDBC flavor: batch replay is at-least-once (dedup key = event_id)") {
    val url = "jdbc:derby:memory:graft_jdbc_replay;create=true"
    val writer = ClickPipeline.jdbcBatchWriter(url, "clicks_raw", props)
    val batch = Seq(("e1", "/", 1L)).toDF("event_id", "page", "cnt")
    writer(batch, 0L)
    writer(batch, 0L) // the documented at-least-once replay
    val back = spark.read.jdbc(url, "clicks_raw", props)
    assert(back.count() == 2, "replayed batch appends again — consumers dedup on event_id")
  }

  test("A12 JDBC flavor: retries are bounded and the final error chains prior attempts") {
    // malformed subprotocol → every attempt throws; maxRetries=1 ⇒ two
    // attempts total, final exception carries the first as suppressed
    val writer = ClickPipeline.jdbcBatchWriter(
      "jdbc:derby:/nonexistent/absolutely/not/writable/db", "t", props,
      maxRetries = 1)
    val batch = Seq(("e1", "/", 1L)).toDF("event_id", "page", "cnt")
    val e = intercept[Exception] { writer(batch, 0L) }
    def chain(t: Throwable): Seq[Throwable] =
      t +: t.getSuppressed.toSeq.flatMap(chain)
    assert(chain(e).size >= 2,
      s"final failure must carry the earlier attempt as suppressed, got: $e")
  }
}
