package graft
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of registry entries:
  * `runMain graft.ExplainOne q01 x47`. Prefix match, like [[BenchOne]].
  * Development harness for the plan-audit loop the operators are held
  * to (pushdown reaching the scan, partial aggregation before
  * exchanges, broadcasts on small sides, no unplanned cartesians) —
  * the assertions live in the specs; this prints the evidence. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
