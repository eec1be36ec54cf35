package graft
import org.apache.spark.sql.SparkSession

/** Time a subset of registry entries: `runMain graft.BenchOne x06 x08 s10`.
  * Prefix match on entry names; same noop-write timing as [[Bench]].
  * Development harness for plan iteration — the driver runs [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q14_minute_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    picked.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch { case e: Throwable =>
        println(s"$name  FAILED: ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
    spark.stop()
  }
}
