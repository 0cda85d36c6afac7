package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main for local schema/plan/timing inspection. Not
  * part of the driver contract. Current use: recall@3 summary plus a
  * cold-run cost breakdown of the ANN serving stack (which index
  * build dominates a cache-cleared `q_ann_recall` rep). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // per-job wall times, to see where a cold build's latency sits
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobT0.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobT0.remove(j.jobId)
          println(f"    job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      })
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A genuine cold rep drains the MEMOS, not just the cache:
    // clearCache() alone leaves the memo returning the same
    // now-uncached frames, which only re-persist on their next memo
    // ACCESS — shared subtrees then re-execute once per consumer
    // inside the first query, overstating cold cost vs a real first
    // run (ADVICE r10). The memo clears unpersist + forget, so the
    // next call rebuilds and re-persists exactly like session start.
    def coldReset(): Unit = {
      graft.engine.Dedup.clearMemos(spark)
      graft.engine.Similarity.clearMemos(spark)
      graft.engine.Tables.clearMemos(spark)
      spark.sqlContext.clearCache()
    }
    // warmup (JIT/codegen), then cold component breakdown
    run(graft.engine.Similarity.qAnnRecall(spark, dir))
    coldReset()
    time("lsh (cold)") { run(graft.engine.Similarity.qAnnLsh(spark, dir)) }
    time("ivf (cold)") { run(graft.engine.Similarity.qAnnIvf(spark, dir)) }
    time("fused (warm)") { run(graft.engine.Similarity.qAnnFused(spark, dir)) }
    time("recall (warm)") { run(graft.engine.Similarity.qAnnRecall(spark, dir)) }
    coldReset()
    time("recall (cold)") { run(graft.engine.Similarity.qAnnRecall(spark, dir)) }

    val r = graft.engine.Similarity.qAnnRecall(spark, dir)
    r.agg(avg("recall_lsh"), avg("recall_ivf"), avg("recall_fused"))
      .show(false)
    spark.stop()
  }
}
