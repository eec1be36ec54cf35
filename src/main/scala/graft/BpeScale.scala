package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.operators.Curation

/** Scale harness for the x68 BPE merge learner: times the learner
  * across a (corpus size × merge count) matrix and counts Spark JOBS
  * per run — the quantity the old one-job-per-merge shape got wrong
  * (272 jobs for 89 merges on this same fixture; a batched
  * verified-replay variant measured 245 jobs because BPE's argmax
  * chains through just-created pairs, truncating every batch at ~1.1
  * merges). The claim under test for the dictionary-local incremental
  * learner: job count is O(1) and wall grows with CORPUS size (the one
  * corpus-sized shuffle + vocabulary build), not with MERGE count.
  *
  * `runMain graft.BpeScale /root/testdata/sf0.01 /tmp/graft_bpe10 10`
  * builds (or reuses) the 10× suffixed-shard fixture via
  * [[ScaleCheck.scaleDir]], then reports one row per cell.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleCheck.scaleDir(spark, src, dst, k, cliques = false)

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    def run(label: String, dir: String, merges: Int): Unit = {
      val docs = Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val learned = Curation.bpeMerges(docs, numMerges = merges,
        maxVocab = 50000000L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      println(f"$label%-12s merges=$merges%5d learned=$learned%5d " +
        f"wall=$sec%7.2fs jobs=${jobs.get() - j0}%5d")
    }

    // warm the JIT/IO once, untimed
    run("warmup(1x)", src, 20)
    println("--- matrix ---")
    run("corpus=1x", src, 20)
    run("corpus=1x", src, 200)
    run("corpus=1x", src, 2000)
    run(s"corpus=${k}x", dst, 200)
    run(s"corpus=${k}x", dst, 2000)
    spark.stop()
  }
}
