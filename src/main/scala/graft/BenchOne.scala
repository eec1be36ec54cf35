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
    // same repeat protocol as Bench: every entry timed `runs` times, all
    // run times printed (first = coldest) plus median/min — the
    // standalone half of the regression-vs-noise evidence matrix
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(3)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val results = (1 to runs).map(_ => Bench.timeEntry(spark, sfDir, fn))
        results.collectFirst { case Left(err) => err } match {
          case Some(err) => println(s"$name  FAILED: $err")
          case None =>
            val secs = results.collect { case Right(s) => s }
            val sorted = secs.sorted
            println(f"$name%-28s runs=[${secs.map(s => f"$s%.2f").mkString(" ")}] " +
              f"median=${sorted(sorted.size / 2)}%.2f min=${sorted.head}%.2f s")
        }
      }
    spark.stop()
  }
}
