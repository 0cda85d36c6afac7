package graft

import graft.engine.{Ingest, PartitionCommitter, Sinks}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Streaming sink behaviors (SURVEY.md §5.2): partitioned directory
  * layout (K2/K4/K5), exactly-once across restart from checkpoint
  * (T2), and watermark-delayed partition visibility (K5 commit
  * policy). Uses the file source as the Kafka stand-in (no broker in
  * this environment) — identical downstream plan. */
class SinksSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private def rec(uuid: String, date: String, ts: Long): String =
    s"""{"uuid":"$uuid","date":"$date","timestamp":$ts,"ad_type":1,"ad_type_name":"x"}"""

  test("K3/K4: parquet sink buckets by event date incl. the error bucket") {
    val in = tmpDir("in"); val out = tmpDir("out"); val cp = tmpDir("cp")
    writeLines(in, "b1.jsonl", Seq(
      rec("a", "2021-04-13T06:23:10.593Z", 1617171790593L),
      rec("b", "2021-04-14T01:00:00.000Z", 1617171790593L),
      rec("c", "TT", 1617171790593L))) // malformed date → error bucket
    Sinks.runAvailableNow(Sinks.parquetPipeline(
      Ingest.parseLenient(Ingest.fileRaw(spark, in)), out, cp))
    val days = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("logday=")).sorted
    assert(days.toSeq == Seq("logday=20210413", "logday=20210414",
      "logday=error"))
    assert(spark.read.parquet(out).count() == 3)
  }

  test("T2: restart from checkpoint is exactly-once (no re-emits)") {
    val in = tmpDir("in"); val out = tmpDir("out"); val cp = tmpDir("cp")
    writeLines(in, "b1.jsonl",
      Seq(rec("a", "2021-04-13T06:00:00.000Z", 1617171790593L)))
    def run(): Unit = Sinks.runAvailableNow(Sinks.parquetPipeline(
      Ingest.parseLenient(Ingest.fileRaw(spark, in)), out, cp))
    run()
    assert(spark.read.parquet(out).count() == 1)
    // restart with no new input: nothing re-emitted
    run()
    assert(spark.read.parquet(out).count() == 1)
    // new file arrives; restart picks up exactly the delta
    writeLines(in, "b2.jsonl",
      Seq(rec("b", "2021-04-13T07:00:00.000Z", 1617171790593L)))
    run()
    val df = spark.read.parquet(out)
    assert(df.count() == 2)
    assert(df.select("uuid").distinct().count() == 2)
  }

  test("K5: partition visible only after watermark ≥ partition time + delay") {
    val in = tmpDir("in"); val loc = tmpDir("tbl"); val cp = tmpDir("cp")
    val staging = tmpDir("staging")
    val table = "source_log_test"
    // two events in different minutes: 06:23 and 06:25
    writeLines(in, "b1.jsonl", Seq(
      rec("a", "2021-03-31T06:23:10.000Z", 1617171790000L),  // 06:23:10
      rec("b", "2021-03-31T06:25:40.000Z", 1617171940000L))) // 06:25:40
    Sinks.createPartitionedTable(spark, table, loc)
    Sinks.runAvailableNow(Sinks.tablePipeline(
      Ingest.parseLenient(Ingest.fileRaw(spark, in)), staging, cp))
    val pc = new PartitionCommitter(spark, table, staging,
      delayMillis = 60000L)
    // files exist on disk, but nothing registered yet → table is empty
    assert(pc.partitionsOnDisk().toSet ==
      Set(("2021-03-31", "06", "23"), ("2021-03-31", "06", "25")))
    assert(spark.table(table).count() == 0)
    // watermark just past 06:23 partition-time+60s → only 06:23 commits
    val wm1 = pc.partitionTime("2021-03-31", "06", "24").get + 60000L
    assert(pc.commitReady(wm1).toSet == Set(("2021-03-31", "06", "23")))
    assert(spark.table(table).count() == 1)
    // watermark far ahead → the rest commits; idempotent re-commit ok
    val wm2 = pc.partitionTime("2021-04-01", "00", "00").get
    pc.commitReady(wm2)
    assert(spark.table(table).count() == 2)
    pc.commitReady(wm2)
    assert(spark.table(table).count() == 2)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("K1/K2: text sink writes raw lines under a processing-day bucket") {
    val in = tmpDir("in"); val out = tmpDir("out"); val cp = tmpDir("cp")
    val lines = Seq(rec("a", "2021-04-13T06:23:10.593Z", 1617171790593L),
      "opaque non-json line survives verbatim")
    writeLines(in, "b1.txt", lines)
    Sinks.runAvailableNow(
      Sinks.textPipeline(Ingest.fileRaw(spark, in), out, cp))
    val days = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("logday="))
    assert(days.length == 1 && days(0).matches("logday=\\d{8}"))
    // round-trip: the sink never parses — bytes in, bytes out
    val back = spark.read.text(out).collect().map(_.getString(0)).toSet
    assert(back == lines.toSet)
  }

  test("K1 rolling policy: maxRecordsPerFile bounds part-file size") {
    // reference parity: Kafka2S3Text rolls a part at 1 GiB
    // (Kafka2S3Text.scala:45); here the size bound is expressed in
    // records — 9 rows with a 3-row bound must roll ≥ 3 part files
    val in = tmpDir("in"); val out = tmpDir("out"); val cp = tmpDir("cp")
    val lines = (1 to 9).map(i => s"line $i")
    writeLines(in, "b1.txt", lines)
    Sinks.runAvailableNow(Sinks.textPipeline(
      Ingest.fileRaw(spark, in), out, cp, maxRecordsPerFile = 3))
    val day = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("logday=")).head
    val parts = day.listFiles().filter(f => f.isFile
      && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(parts.length >= 3, parts.map(_.getName).mkString(","))
    assert(spark.read.text(out).collect().map(_.getString(0)).toSet
      == lines.toSet)
  }

  test("compaction: many small files -> few, identical rows, S3A-safe flip") {
    import spark.implicits._
    val table = "compact_unit_test"
    val root = tmpDir("compact")
    val part = s"$root/logday=2021-04-13/h=06/m=23"
    // 20 single-row files, as a minute-level streaming trigger leaves
    (0 until 20).foreach { i =>
      Seq((i.toLong, s"u$i")).toDF("id", "uuid")
        .write.mode("append").parquet(part)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, uuid STRING,
      logday STRING, h STRING, m STRING)
      USING PARQUET PARTITIONED BY (logday, h, m)
      LOCATION '$root'""")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(logday='2021-04-13', h='06', m='23') LOCATION '$part'")
    val before = spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet
    val nBefore = new java.io.File(part).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(nBefore >= 20)
    val (b, a) = Sinks.compactTablePartition(spark, table,
      Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "23"))
    assert(b == nBefore && a == 1) // tiny total → one 128MB-target file
    // rows identical through the flipped location; old dir gone
    val after = spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet
    assert(after == before)
    assert(!new java.io.File(part).exists())
    // re-compaction of an already-compact partition is a no-op
    assert(Sinks.compactTablePartition(spark, table,
      Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "23")) == ((1, 1)))
    // unsafe partition values are rejected before touching DDL
    assertThrows[IllegalArgumentException] {
      Sinks.compactTablePartition(spark, table,
        Seq("logday" -> "2021-04-13', h='x"))
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("retention grace: absorbed files outlive the flip until the window ages out") {
    import spark.implicits._
    val table = "compact_retention_test"
    val root = tmpDir("retention")
    val part = s"$root/logday=2021-04-13/h=06/m=25"
    val spec = Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "25")
    (0 until 5).foreach { i =>
      Seq((i.toLong, s"u$i")).toDF("id", "uuid")
        .write.mode("append").parquet(part)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, uuid STRING,
      logday STRING, h STRING, m STRING)
      USING PARQUET PARTITIONED BY (logday, h, m)
      LOCATION '$root'""")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(logday='2021-04-13', h='06', m='25') LOCATION '$part'")
    val before = spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet
    val grace = 3600 * 1000L
    val (b, a) = Sinks.compactTablePartition(spark, table, spec,
      retentionMs = grace)
    assert(b == 5 && a == 1)
    // flip happened (reads go through the compact dir) but the
    // absorbed staging files SURVIVE for concurrent readers that
    // resolved the old location just before the flip
    assert(spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet == before)
    val stagingFiles = new java.io.File(part).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(stagingFiles == 5, s"staging files deleted despite grace")
    // a reconcile pass inside the grace window leaves them alone
    assert(!Sinks.reconcileLatePartition(spark, table, spec, part,
      retentionMs = grace))
    assert(new java.io.File(part).exists())
    // age the flip past the window (backdate the manifest, the flip
    // timestamp proxy) — the next pass finishes the delete
    val hDir = new java.io.File(s"$root/logday=2021-04-13/h=06")
    val compactDir = hDir.listFiles()
      .filter(_.getName.startsWith("compact_m=25_v")).head
    assert(new java.io.File(compactDir, "_absorbed")
      .setLastModified(System.currentTimeMillis() - 2 * grace))
    assert(!Sinks.reconcileLatePartition(spark, table, spec, part,
      retentionMs = grace))
    assert(!new java.io.File(part).exists(), "aged staging not drained")
    assert(spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet == before)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("retention grace: a compact-ONLY caller drains aged absorbed staging") {
    // the round-7 advice gap: deferred absorbed-staging deletes were
    // drained solely by reconcileLatePartition, so a scheduler driving
    // only compactTablePartition leaked staging files forever
    import spark.implicits._
    val table = "compact_drain_test"
    val root = tmpDir("draincompact")
    val part = s"$root/logday=2021-04-13/h=06/m=27"
    val spec = Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "27")
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"u$i")).toDF("id", "uuid")
        .write.mode("append").parquet(part)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, uuid STRING,
      logday STRING, h STRING, m STRING)
      USING PARQUET PARTITIONED BY (logday, h, m)
      LOCATION '$root'""")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(logday='2021-04-13', h='06', m='27') LOCATION '$part'")
    val before = spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet
    val grace = 3600 * 1000L
    assert(Sinks.compactTablePartition(spark, table, spec,
      retentionMs = grace) == ((4, 1)))
    // inside the grace window the no-op compact pass leaves them alone
    assert(Sinks.compactTablePartition(spark, table, spec,
      retentionMs = grace) == ((1, 1)))
    assert(new java.io.File(part).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet")) == 4)
    // age the flip out; the next compact-only pass finishes the drain
    val hDir = new java.io.File(s"$root/logday=2021-04-13/h=06")
    val compactDir = hDir.listFiles()
      .filter(_.getName.startsWith("compact_m=27_v")).head
    assert(new java.io.File(compactDir, "_absorbed")
      .setLastModified(System.currentTimeMillis() - 2 * grace))
    assert(Sinks.compactTablePartition(spark, table, spec,
      retentionMs = grace) == ((1, 1)))
    assert(!new java.io.File(part).exists(), "aged staging not drained")
    assert(spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet == before)
    // a MARKER-ONLY staging dir (a prior drain deleted the data files
    // but crashed before the rmdir) must also be removed — the drain
    // may not gate the dir removal on having deleted files itself
    val markerDir = new java.io.File(part)
    markerDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(part, "_SUCCESS"), Array.empty[Byte])
    assert(Sinks.compactTablePartition(spark, table, spec,
      retentionMs = grace) == ((1, 1)))
    assert(!markerDir.exists(), "marker-only staging dir leaked")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("orphan compact dirs are swept even when the partition never flips again") {
    import spark.implicits._
    val table = "compact_orphan_test"
    val root = tmpDir("orphan")
    val part = s"$root/logday=2021-04-13/h=06/m=26"
    val spec = Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "26")
    Seq((1L, "u1")).toDF("id", "uuid").write.mode("append").parquet(part)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, uuid STRING,
      logday STRING, h STRING, m STRING)
      USING PARQUET PARTITIONED BY (logday, h, m)
      LOCATION '$root'""")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(logday='2021-04-13', h='06', m='26') LOCATION '$part'")
    Sinks.compactTablePartition(spark, table, spec)
    // a crash between an earlier flip and its delete left a dead
    // sibling; the partition is already compact so every later call
    // takes the no-op path — which must still sweep the orphan
    // (round-6 gap: the sweep only ran inside rewriteAndFlip)
    val stale = new java.io.File(
      s"$root/logday=2021-04-13/h=06/compact_m=26_v99")
    stale.mkdirs()
    java.nio.file.Files.write(
      stale.toPath.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    assert(Sinks.compactTablePartition(spark, table, spec) == ((1, 1)))
    assert(!stale.exists(), "no-op path leaked the orphan dir")
    // same recovery via reconcile's staging-missing early return
    stale.mkdirs()
    java.nio.file.Files.write(
      stale.toPath.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    assert(!Sinks.reconcileLatePartition(spark, table, spec, part))
    assert(!stale.exists(), "reconcile early return leaked the orphan dir")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("schema evolution: mergeSchema unifies old and new part files") {
    import spark.implicits._
    // a long-lived partitioned lake accretes files written under
    // successive schemas; readers must see the union with nulls for
    // columns a file predates — the evolution story plain parquet
    // supports (adds, not renames/retypes)
    val dir = tmpDir("evolve")
    Seq((1L, "a")).toDF("id", "uuid").write.mode("append").parquet(dir)
    Seq((2L, "b", 7)).toDF("id", "uuid", "ad_type")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", true).parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("ad_type", "id", "uuid"))
    val rows = merged.select("id", "uuid", "ad_type")
      .as[(Long, String, Option[Int])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(7))))
  }

  test("crash-safe compaction: leftover absorbed files cleaned, never re-merged") {
    import spark.implicits._
    val table = "compact_crash_test"
    val root = tmpDir("crash")
    val part = s"$root/logday=2021-04-13/h=06/m=24"
    val spec = Seq("logday" -> "2021-04-13", "h" -> "06", "m" -> "24")
    (0 until 5).foreach { i =>
      Seq((i.toLong, s"u$i")).toDF("id", "uuid")
        .write.mode("append").parquet(part)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table (id BIGINT, uuid STRING,
      logday STRING, h STRING, m STRING)
      USING PARQUET PARTITIONED BY (logday, h, m)
      LOCATION '$root'""")
    spark.sql(s"ALTER TABLE $table ADD PARTITION " +
      s"(logday='2021-04-13', h='06', m='24') LOCATION '$part'")
    // snapshot the staging part files — the simulated crash restores them
    val saved = new java.io.File(part).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
      .sortBy(_._1)
    val before = spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet
    Sinks.compactTablePartition(spark, table, spec)
    // simulate a crash between LOCATION flip and source delete: two of
    // the absorbed files survive in the staging dir. Reconcile must
    // recognize them by the _absorbed manifest and finish the delete —
    // re-merging would duplicate their rows.
    new java.io.File(part).mkdirs()
    saved.take(2).foreach { case (n, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(part, n), bytes) }
    assert(!Sinks.reconcileLatePartition(spark, table, spec, part))
    assert(spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(part).exists()) // leftovers drained away
    // mixed case: one absorbed leftover AND one genuinely-late file —
    // the merge takes only the late row, the leftover still dies.
    // A dead compact sibling (crash between an earlier flip and its
    // delete) must also be swept by the next flip.
    val stale = new java.io.File(
      s"$root/logday=2021-04-13/h=06/compact_m=24_v99")
    stale.mkdirs()
    java.nio.file.Files.write(
      stale.toPath.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    new java.io.File(part).mkdirs()
    saved.take(1).foreach { case (n, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(part, n), bytes) }
    Seq((100L, "late")).toDF("id", "uuid")
      .write.mode("append").parquet(part)
    assert(Sinks.reconcileLatePartition(spark, table, spec, part))
    assert(spark.table(table).select("id", "uuid")
      .as[(Long, String)].collect().toSet == before + ((100L, "late")))
    assert(!new java.io.File(part).exists())
    assert(!stale.exists()) // orphan swept by the flip
    // exactly one live compact dir remains (the flip target)
    assert(new java.io.File(s"$root/logday=2021-04-13/h=06").listFiles()
      .count(_.getName.startsWith("compact_m=24_v")) == 1)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
