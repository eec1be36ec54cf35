package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are expensive;
  * specs must not stop it). Same GraftSession defaults as Verify/Bench so
  * test plans are the plans the driver sees. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
  val Sf0001 = "/root/testdata/sf0.001"
}
