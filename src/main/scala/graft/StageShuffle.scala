package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-STAGE shuffle attribution for one registry entry: when ScaleCheck
  * reports a super-linear total, this names the stage responsible.
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.StageShuffle x71` prints every
  * stage's shuffle write (bytes + records) and its callsite name. */
object StageShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics.shuffleWriteMetrics
        rows.add((e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n').take(90),
          m.bytesWritten, m.recordsWritten))
      }
    })
    val name = args.head
    val fn = SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name)).getOrElse(sys.error(s"no entry $name"))
    println(s"== ${fn._1} on $sfDir ==")
    fn._2(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.sortBy(-_._3).foreach { case (id, nm, b, r) =>
      if (b > 0) println(f"stage $id%4d ${b / 1048576.0}%10.2fMB ${r}%12d rows  $nm")
    }
    spark.stop()
  }
}
