package graft
import org.apache.spark.sql.SparkSession

/** Time a subset of registry entries: `runMain graft.BenchOne x06 x08 s10`.
  * Prefix match on entry names; shares [[Bench]]'s warmup and noop-write
  * timing (one methodology, two frontends). Development harness for plan
  * iteration — the driver runs [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        Bench.timeEntry(spark, sfDir, fn) match {
          case Right(sec) => println(f"$name%-28s $sec%8.2f s")
          case Left(err)  => println(s"$name  FAILED: $err")
        }
      }
    spark.stop()
  }
}
