package graft.tools

import graft.engine.Scale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev evidence for Z-order clustering ([[Scale.writeZordered]]):
  * writes the SAME synthetic 2-D fact table in a single-column-sorted
  * layout and a z-ordered layout, runs an identical 2-D box query
  * against both, and reports what the parquet scan actually emitted
  * (the row-group-pruning effect) plus the box-count equality check.
  *
  * Why scan-output rows is the honest metric: file/row-group pruning
  * happens inside the reader from column min/max stats — a layout
  * change shows up as FEWER ROWS SURVIVING THE SCAN for the same
  * query, not as a different plan. The single-column sort gives tight
  * stats on that column only (scan output ≈ selectivity of dim A);
  * z-order tightens BOTH (scan output ≈ the box).
  *
  * Usage: sbt "runMain graft.tools.ZorderScale [rows]"
  * Measured (local[32], rows = 10M, 64 files, 256 KiB row groups,
  * 10%×10% box = 1% of the 2-D space): both layouts return the
  * identical 100,114 box rows; the uid-sorted layout's scans emit
  * 1,007,405 rows (pruned to dim-A's 10% selectivity — its t stats
  * are useless) vs the z-ordered layout's 231,461 (2.3% of the
  * table, within 2.3× of the box itself) — 4.4× less scan work from
  * LAYOUT alone, growing with row-group granularity (at default
  * 128 MiB blocks the tool's 4 MB files are single row groups and
  * the two layouts tie — pruning granularity, not the curve, is the
  * binding constraint; at 100 TB both files and row groups are
  * plentiful). */
object ZorderScale {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // deterministic 2-D points: uid and t decorrelated via xxhash64
    val pts = spark.range(rows).select(
      pmod(xxhash64(col("id")), lit(100000L)).as("uid"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("t"),
      col("id").as("payload"))
    val files = 64

    // both layouts written with 256 KiB row groups: at 10M×24B the
    // default 128 MiB block makes every FILE one row group and the
    // pruning granularity is the file — fine at 100 TB (where files
    // are many and row groups plentiful), degenerate at tool scale
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 256 * 1024)
    // layout A: single-column sort (the best one-dimensional layout)
    pts.repartitionByRange(files, col("uid"))
      .sortWithinPartitions(col("uid"))
      .write.mode("overwrite").parquet(s"$base/linear")
    // layout B: z-ordered on (uid, t)
    Scale.writeZordered(pts, s"$base/zorder", "uid", "t", files)

    // identical 10% × 10% box query against both (1% of the 2-D space)
    def box(df: DataFrame): DataFrame =
      df.filter(col("uid").between(40000, 49999) &&
        col("t").between(500000, 599999))
    def scanRows(path: String): (Long, Long) = {
      val df = box(spark.read.parquet(path))
      // execute THIS frame (collect), then read the scan's metric off
      // the SAME execution — count() would plan and run a different
      // query whose metrics this queryExecution never sees
      val n = df.collect().length.toLong
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      val emitted = scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      (n, emitted)
    }
    val (nLin, sLin) = scanRows(s"$base/linear")
    val (nZ, sZ) = scanRows(s"$base/zorder")
    assert(nLin == nZ, s"box counts differ: $nLin vs $nZ")
    println(f"box rows: $nLin (equal in both layouts)")
    println(f"scan emitted: linear=$sLin zorder=$sZ " +
      f"(${sLin.toDouble / sZ}%.1fx less scan work)")
    assert(sZ * 2 < sLin,
      s"z-order pruning ineffective: $sZ vs $sLin")
    spark.stop()
  }
}
