package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path must make every custom expression usable from
  * plain SQL in a session built with
  * `spark.sql.extensions=graft.GraftExtensions` — no driver-side
  * register call. Built as a separate application-level session (the
  * extension point is build-time), then stopped so the shared test
  * session is undisturbed. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install all kernel functions for plain SQL") {
    // getOrCreate returns the active/default session when one exists —
    // which would silently skip the extensions under test — so both are
    // cleared (and restored after). The new session shares the JVM's
    // SparkContext, so it must NOT be stopped.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf, read only when the
    // SparkContext is first created — under a shared test context it
    // would be silently ignored, so the spec installs the same class
    // through the builder's withExtensions hook (the equivalent
    // build-time path for embedded applications).
    val s = GraftSession.configure(
        SparkSession.builder().master("local[2]"), "2")
      .withExtensions(new GraftExtensions)
      .appName("graft-extensions-spec")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT
          |  word_shingles('a b c d', 3) AS sh,
          |  word_gram_seq('a b a b', 2) AS gs,
          |  distinct_ngram_count('a b a b', 2) AS n,
          |  round(dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                    array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))), 4) AS dp,
          |  round(cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                          array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 4) AS cos,
          |  normalize_text('café' || chr(7) || ' x') AS norm
          |""".stripMargin).head()
      assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
      assert(r.getSeq[String](1) == Seq("a b", "b a", "a b")) // positional: repeats kept
      assert(r.getLong(2) == 2L)
      assert(r.getDouble(3) == 11.0)
      assert(r.getDouble(4) == 1.0)
      assert(r.getString(5) == "caf\u00e9 x") // composed + BEL stripped
      // wrong arity fails analysis loudly, not at runtime
      intercept[Exception](s.sql("SELECT word_shingles('a')").head())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
