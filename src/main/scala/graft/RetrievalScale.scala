package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.operators.Curation

/** Scale harness for the retrieval family's df-cap story on the
  * MASS-DUPLICATED corpus. The normal (suffixed-shard, disjoint-
  * vocabulary) fixture proves the postings semi-join keeps shuffle rows
  * CONSTANT as the corpus grows (the query vocabulary is fixed, so
  * foreign shards contribute no postings — `ScaleCheck ... x71 x76
  * x77` covers that). The clique fixture is the opposite regime: every
  * replica family shares one vocabulary, so query-term posting lists
  * grow WITH the corpus — linear, bounded by the rarest-term budget —
  * and the WAND-style `maxDfFrac` stop-term cap is the knob that trades
  * blanket terms' ~zero idf contribution for bounded postings. This
  * harness measures bm25 uncapped vs capped on 1× and the cliques:k
  * fixture, reporting wall + shuffle ROWS (bytes mislead across
  * differently-compressible corpora).
  *
  * `runMain graft.RetrievalScale /root/testdata/sf0.1 /tmp/graft_cl10 10`
  */
object RetrievalScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleCheck.scaleDir(spark, src, dst, k, cliques = true)

    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        rows.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })

    // the async listener bus drains after jobs complete: wait until the
    // shuffle-row counter holds still for two consecutive intervals
    // (a fixed sleep lets one run's late events bleed into the next
    // run's delta under load)
    def settledRows(): Long = {
      var prev = -1L
      var cur = rows.get()
      while (cur != prev) { Thread.sleep(200); prev = cur; cur = rows.get() }
      cur
    }

    def run(label: String, dir: String, frac: Option[Double]): Unit = {
      val docs = Tables.documents(spark, dir)
      val r0 = settledRows()
      val t0 = System.nanoTime()
      val n = Curation.bm25TopK(docs, maxDfFrac = frac).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s rows=$n%6d wall=$sec%7.2fs shuffle_rows=${settledRows() - r0}%12d")
    }

    // On the synthetic corpus every EVAL-SLICE query term is a blanket
    // term (df ≈ 0.77·n — the fixture's vocabulary is nearly a delta;
    // its rare tail never appears in a query doc), so any binding cap
    // empties the result here BY DESIGN: a corpus where every query term
    // blankets has nothing retrievable once blanket terms are dropped.
    // What this harness therefore measures is the POSTINGS bound — the
    // capped run's shuffle rows must stay scale-constant while the
    // uncapped run's grow with the clique corpus. Semantic preservation
    // under a binding-but-not-degenerate cap (rare terms still retrieve)
    // is spec-proven on a planted corpus in CurationSpec.
    run("warmup(1x, uncapped)", src, None)
    println("--- matrix ---")
    run("corpus=1x   uncapped", src, None)
    run("corpus=1x   maxDfFrac=0.2", src, Some(0.2))
    run(s"corpus=${k}x-cliques uncapped", dst, None)
    run(s"corpus=${k}x-cliques maxDfFrac=0.2", dst, Some(0.2))
    spark.stop()
  }
}
