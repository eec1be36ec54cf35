package graft
import org.apache.spark.sql.SparkSession

/** Print the result rows of registry entries:
  * `runMain graft.ShowOne x99 x89`. Prefix match, like [[BenchOne]] /
  * [[ExplainOne]] — the third leg of the dev-harness trio (plan, time,
  * values). Development only; the driver's correctness gate is
  * [[Verify]] + the DuckDB oracle. */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).show(50, false)
        catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
