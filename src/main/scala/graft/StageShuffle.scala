package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE shuffle + wall attribution for one registry entry: when
  * ScaleCheck reports a super-linear total (or a wall ratio with LINEAR
  * shuffle), this names the stage responsible.
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.StageShuffle x71` prints every
  * stage's shuffle write (bytes + records), its wall duration and summed
  * task time, and its callsite name — sorted by wall, so the top line IS
  * the bottleneck. */
object StageShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // diagnostic conf overrides, e.g. SPARK_GRAFT_CONF=
    // "spark.sql.autoBroadcastJoinThreshold=-1" to measure what a 1×
    // baseline WOULD shuffle if its broadcasts were exchanges — the
    // honest denominator for a k× rows ratio whose k× side outgrew the
    // broadcast threshold
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics.shuffleWriteMetrics
        val wall = (for (s <- e.stageInfo.submissionTime; c <- e.stageInfo.completionTime)
          yield c - s).getOrElse(0L)
        rows.add((e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n').take(90),
          m.bytesWritten, m.recordsWritten, wall,
          e.stageInfo.taskMetrics.executorRunTime))
      }
    })
    val name = args.head
    val fn = SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name)).getOrElse(sys.error(s"no entry $name"))
    println(s"== ${fn._1} on $sfDir ==")
    val t0 = System.nanoTime()
    fn._2(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"total wall: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.sortBy(-_._5).foreach { case (id, nm, b, r, w, tt) =>
      if (b > 0 || w > 200)
        println(f"stage $id%4d wall=${w / 1000.0}%7.2fs tasks=${tt / 1000.0}%8.2fs " +
          f"${b / 1048576.0}%10.2fMB ${r}%12d rows  $nm")
    }
    spark.stop()
  }
}
