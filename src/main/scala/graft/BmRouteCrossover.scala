package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingQueries

/** Receipt harness for the BM25 serving IN-list boundary
  * ([[graft.operators.Curation.BmInMaxTerms]]): measures one serve of a
  * WIDE query batch through both store-prune routes — the literal-IN
  * pushdown (s38's default) and the s36 broadcast left-semi fallback —
  * at growing per-trigger distinct-token counts, against the 100×
  * postings store. The fixture vocabulary is small by construction, so
  * width comes from synthetic out-of-vocabulary terms appended to the
  * full real vocabulary: exactly the cost the boundary is about (the
  * literal list's plan/pushdown weight grows with its WIDTH, not with
  * how many of its terms hit), while every in-vocabulary term keeps the
  * retrieval itself non-trivial.
  *
  * `runMain graft.BmRouteCrossover /tmp/scale100 1024,4096,16384,65536`
  */
object BmRouteCrossover {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val widths = args.lift(1).getOrElse("1024,4096,16384,65536")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
    val work = WorkDirs.tempDir("graft_bmxover_")
    val tfTbl = "bmxover_tf"; val dfTbl = "bmxover_df"
    try {
      // the s38 index build — the SHARED builder, not a copy
      val (nDocs, avgdl) =
        StreamingQueries.buildBm25Index(spark, docs, work, tfTbl, dfTbl)
      val vocab = spark.table(dfTbl).select("token")
        .collect().map(_.getString(0)).sorted

      println(f"store: ${spark.table(tfTbl).count()} posting rows, " +
        f"${vocab.length} vocab terms, $nDocs docs")
      println(f"${"width"}%8s ${"in_s"}%8s ${"semi_s"}%8s")
      for (w <- widths) {
        // one 64-query trigger whose union token set has width w:
        // the full real vocabulary + synthetic OOV fill, dealt
        // round-robin across the queries
        val toks = (vocab ++ (0 until (w - vocab.length).max(0))
          .map(i => f"zqoov$i%06d")).take(w)
        val batch = toks.zipWithIndex.groupBy(_._2 % 64).toSeq
          .map { case (q, ts) => (q.toLong, ts.map(_._1).mkString(" ")) }
          .toDF("query_id", "text")
          .localCheckpoint()
        def timeRoute(cap: Int): Double = {
          val runs = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            StreamingQueries.bm25BatchRank(spark, batch,
                spark.table(tfTbl), spark.table(dfTbl), nDocs, avgdl,
                k = 10, inMaxTerms = cap)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          runs.min
        }
        val inS = timeRoute(1 << 24)
        val semiS = timeRoute(0)
        println(f"$w%8d $inS%8.2f $semiS%8.2f")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tfTbl")
      spark.sql(s"DROP TABLE IF EXISTS $dfTbl")
    }
    spark.stop()
  }
}
