package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main for local schema/plan inspection. Not part of
  * the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val r = graft.engine.Similarity.qAnnRecall(spark, dir)
    r.agg(avg("recall_lsh"), avg("recall_ivf"), avg("recall_fused"))
      .show(false)
    spark.stop()
  }
}
