package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data
  * (TESTDATA.md) plus per-session runtime tuning.
  *
  * Scale notes: every reader goes through `spark.read.parquet` so
  * Catalyst handles column pruning + predicate pushdown into the
  * scan; at cluster scale the same code reads partitioned S3/HDFS
  * layouts unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The events table stores TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects natively; with nanosAsLong (set in tune) it
    // arrives as LongType nanos. Truncate to micros with *integer*
    // division — epoch nanos (~1.7e18) exceed double's exact integer
    // range, so `/ 1000` through DOUBLE would corrupt timestamps.
    // Truncation (not rounding) matches DuckDB's ns→µs behavior.
    df.schema.fields.find(f => f.name == "ts"
        && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  // Keyed per SparkSession (identity), not JVM-global: if the harness
  // stops a session and builds a new one in the same JVM, the new
  // session must be re-tuned (it would otherwise miss nanosAsLong and
  // fail reading events.parquet with PARQUET_TYPE_ILLEGAL).
  private val tunedSessions =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent runtime tuning. These are all runtime-settable SQL
    * confs, so they work regardless of how the harness built the
    * session (Verify/Bench/tests all funnel through Tables).
    */
  def tune(spark: SparkSession): Unit = synchronized {
    if (!tunedSessions.contains(spark)) {
      val c = spark.conf
      // AQE: runtime partition coalescing + skew-join splitting; at
      // 100 TB this is what keeps post-shuffle partitions sized right.
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // Dimension tables (region/nation/supplier/part/customer) stay
      // far below this; broadcast them instead of shuffling lineitem.
      c.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // events.parquet stores TIMESTAMP(NANOS,false) which the vectorized
      // reader rejects ([PARQUET_TYPE_ILLEGAL]); read as Long and convert.
      c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native functions (SQL name graft_dot); cluster deployments can
      // instead set spark.sql.extensions=graft.functions.GraftExtensions
      graft.functions.GraftFunctions.register(spark)
      // runtime twin of GraftExtensions' injectOptimizerRule: rewrite
      // the interpreted HOF dot-product pattern to the native
      // codegen'd DotProduct wherever it appears
      if (!spark.experimental.extraOptimizations
          .contains(graft.plans.RewriteDotProduct)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            graft.plans.RewriteDotProduct
      }
      tunedSessions.add(spark)
    }
  }
}
