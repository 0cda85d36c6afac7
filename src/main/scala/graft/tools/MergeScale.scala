package graft.tools

import graft.engine.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev evidence for the CDC-upsert scale shape: bootstrap a base far
  * beyond the SF fixtures, apply a SMALL change batch, and measure
  * what the merge actually touched — the partition-pruning claim as
  * numbers instead of prose. The base value column is integral so
  * every check is a closed-form integer (no float tolerance).
  *
  * Two regimes are measured on purpose:
  *  - batch keys ≪ buckets: the merge reads/rewrites only the few
  *    buckets the keys hash to — IO ∝ batch, not base (the Delta
  *    file-pruning analog; this is why `nb` must be sized ABOVE the
  *    expected change-batch key cardinality, 100k+ buckets at 100 TB);
  *  - batch keys ≫ buckets: every bucket is hit and the rewrite
  *    degrades to a full pass — the documented failure mode hash
  *    bucketing cannot avoid (temporal locality needs range buckets).
  *
  * Usage: sbt "runMain graft.tools.MergeScale [rows] [nb]"
  * Measured (local[32], rows = 10M, nb = 1024): bootstrap 11.7 s
  * (was 104 s before the keyed pre-write repartition — the
  * tasks × buckets small-file explosion measured and fixed here);
  * 96-key batch → 92/1024 buckets touched (9.0% of the base),
  * 6.3 s, checksum exact; 100k-key batch → 1024/1024 touched (the
  * documented hash-bucketing degradation), 9.1 s; re-applying the
  * last batch is a checksum no-op. */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val nb = if (args.length > 1) args(1).toInt else 1024
    // the 64-key update batch strides rows/64 — below that the keys
    // collapse onto key 0 and the closed-form checksums are wrong by
    // construction, so fail with an argument error, not a checksum one
    require(rows >= 4096, s"rows=$rows too small: need >= 4096")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("mergescale")
      .toString + "/state"
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def bucketMtimes(): Map[String, Long] = {
      val d = new java.io.File(dir)
      if (!d.exists) Map.empty
      else d.listFiles.filter(_.getName.startsWith("kb="))
        .map(f => f.getName -> f.listFiles.map(_.lastModified).max).toMap
    }
    def checksum(): (Long, Long) = {
      val r = spark.read.parquet(dir)
        .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].first()
      r
    }

    // bootstrap: keys 0..rows-1, v = key (Σ = rows(rows-1)/2)
    val (_, tBoot) = time {
      StreamingOps.applyUpsertBatch(
        spark.range(rows).select(col("id").as("key"),
          lit("A").as("status"), col("id").as("v"), lit(0L).as("seq")),
        dir, nb)
    }
    val (n0, s0) = checksum()
    assert(n0 == rows && s0 == rows * (rows - 1) / 2, (n0, s0))
    println(f"bootstrap rows=$rows nb=$nb wall=$tBoot%.1f s (checksum ok)")

    // small batch: 64 scattered updates (v += 1) + 32 inserts
    val upd = (0 until 64).map(i => (i * (rows / 64), "U",
      i * (rows / 64) + 1, 1L))
    val ins = (0 until 32).map(i => (rows + i, "N", 7L, 1L))
    val before = bucketMtimes()
    val (_, tSmall) = time {
      StreamingOps.applyUpsertBatch(
        (upd ++ ins).toDF("key", "status", "v", "seq"), dir, nb)
    }
    val after = bucketMtimes()
    val touched = after.count { case (k, m) => before.get(k) != Some(m) }
    val (n1, s1) = checksum()
    assert(n1 == rows + 32 && s1 == rows * (rows - 1) / 2 + 64 + 32 * 7,
      (n1, s1))
    println(f"small batch (96 keys): touched $touched/$nb buckets " +
      f"(${100.0 * touched / nb}%.1f%% of the base), wall=$tSmall%.1f s " +
      "(checksum ok)")

    // wide batch: 100k update keys — every bucket hit, the documented
    // degradation regime
    val wide = spark.range(100000).select((col("id") * (rows / 100000L))
        .as("key"), lit("W").as("status"), lit(0L).as("v"), lit(2L).as("seq"))
    val b2 = bucketMtimes()
    val (_, tWide) = time { StreamingOps.applyUpsertBatch(wide, dir, nb) }
    val touched2 = bucketMtimes().count { case (k, m) => b2.get(k) != Some(m) }
    val (n2, s2) = checksum()
    assert(n2 == rows + 32, n2)
    println(f"wide batch (100k keys): touched $touched2/$nb buckets, " +
      f"wall=$tWide%.1f s (checksum ok)")

    // idempotency: re-apply the wide batch, state checksum unchanged
    StreamingOps.applyUpsertBatch(wide, dir, nb)
    val (n3, s3) = checksum()
    assert((n3, s3) == (n2, s2), ((n3, s3), (n2, s2)))
    println("re-apply: checksum unchanged (effectively-once)")
    spark.stop()
  }
}
