package graft
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val wsc = sys.env.getOrElse("WSC", "true")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.codegen.wholeStage", wsc)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(s"$n: ${(System.nanoTime()-t0)/1e9}s"); r }
    time("minhash sf0.1 cold wsc="+wsc){ graft.engine.Dedup.qDedupMinhash(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save() }
    time("minhash sf0.1 warm"){ graft.engine.Dedup.qDedupMinhash(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
