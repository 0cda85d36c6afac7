package graft

import graft.engine.{Ingest, StreamingOps, TimeOps}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Event-time windowed aggregation, session windows, and
  * flatMapGroupsWithState sessionization over a file-backed stream
  * (the Kafka stand-in). Timestamps are crafted so the watermark
  * passes the interesting windows: in append mode only closed
  * windows/sessions emit, so each fixture ends with a "flush" record
  * far in the future. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  // base: 2021-03-31 06:23:00 UTC = epoch 1617171780000
  private val T0 = 1617171780000L
  private def rec(uuid: String, ts: Long, adType: Int = 1): String =
    s"""{"uuid":"$uuid","date":"x","timestamp":$ts,"ad_type":$adType,"ad_type_name":"x"}"""

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def writeInput(lines: Seq[String]): String = {
    val dir = tmpDir("sin")
    Files.write(Paths.get(dir, "in.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    dir
  }

  test("tumbling window counts emit once the watermark passes window end") {
    val in = writeInput(Seq(
      rec("a", T0 + 1000, 1), rec("b", T0 + 2000, 1), // window 06:23, type 1
      rec("c", T0 + 3000, 2),                         // window 06:23, type 2
      rec("d", T0 + 61000, 1),                        // window 06:24
      rec("z", T0 + 10 * 60000, 9)))                  // flush: advances watermark
    val out = runToMemory(
      StreamingOps.windowedCounts(
        Ingest.parseLenient(Ingest.fileRaw(spark, in))), "win_counts")
      .select("w_start", "ad_type", "n")
      .as[(java.sql.Timestamp, Int, Long)].collect().toSet
    val w2323 = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(T0))
    val w2324 = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(T0 + 60000))
    // closed windows emitted exactly once; the flush window stays open
    assert(out == Set((w2323, 1, 2L), (w2323, 2, 1L), (w2324, 1, 1L)))
  }

  test("hopping window counts: an event emits from every overlapping window") {
    // 1-minute windows sliding every 30 s — each event belongs to 2;
    // the state/emission semantics are the tumble's, per window copy
    val in = writeInput(Seq(
      rec("a", T0 + 1000, 1),              // windows 06:22:30 and 06:23:00
      rec("z", T0 + 10 * 60000, 9)))       // flush
    val out = runToMemory(
      StreamingOps.windowedCounts(
        Ingest.parseLenient(Ingest.fileRaw(spark, in)),
        slide = Some("30 seconds")), "hop_counts")
      .select("w_start", "ad_type", "n")
      .as[(java.sql.Timestamp, Int, Long)].collect().toSet
    def ts(ms: Long) = java.sql.Timestamp
      .from(java.time.Instant.ofEpochMilli(ms))
    assert(out == Set((ts(T0 - 30000), 1, 1L), (ts(T0), 1, 1L)))
  }

  test("session windows merge events within the gap") {
    val in = writeInput(Seq(
      rec("u1", T0), rec("u1", T0 + 10000), rec("u1", T0 + 20000), // one session
      rec("u1", T0 + 120000),                   // > 30s gap → new session
      rec("zz", T0 + 10 * 60000)))              // flush
    val out = runToMemory(
      StreamingOps.sessionCounts(
        Ingest.parseLenient(Ingest.fileRaw(spark, in))), "sess_counts")
      .filter($"uuid" === "u1")
      .select("uuid", "n").as[(String, Long)].collect().toSeq.sortBy(-_._2)
    assert(out == Seq(("u1", 3L), ("u1", 1L)))
  }

  test("T3: stateful agg runs on the RocksDB state store provider") {
    // the reference's spillable state backend (Kafka2S3Text.scala:69-70)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = writeInput(Seq(
        rec("a", T0 + 1000, 1), rec("b", T0 + 2000, 1),
        rec("z", T0 + 10 * 60000, 9)))
      val out = runToMemory(
        StreamingOps.windowedCounts(
          Ingest.parseLenient(Ingest.fileRaw(spark, in))), "rocks_counts")
        .select("ad_type", "n").as[(Int, Long)].collect().toSet
      assert(out == Set((1, 2L)))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup keeps first occurrence, bounded by watermark") {
    val in = writeInput(Seq(
      rec("a", T0 + 1000, 1), rec("a", T0 + 2000, 2), // dup uuid within horizon
      rec("b", T0 + 3000, 3),
      rec("zz", T0 + 10 * 60000)))
    val out = runToMemory(
      StreamingOps.dedupStream(
        Ingest.parseLenient(Ingest.fileRaw(spark, in))), "dedup_stream")
      .filter($"uuid".isin("a", "b"))
      .select("uuid").as[String].collect().toSeq.sorted
    assert(out == Seq("a", "b")) // the second "a" was dropped
  }

  test("stream-stream join buffers within the event-time window only") {
    val impDir = writeInput(Seq(
      rec("i1", T0, 1), rec("i2", T0 + 5000, 2),
      rec("zz", T0 + 10 * 60000)))
    val clkDir = writeInput(Seq(
      rec("i1", T0 + 30000),           // within 1 min of i1 → joins
      rec("i2", T0 + 300000),          // 5 min after i2 → outside window
      rec("zz", T0 + 20 * 60000)))
    val joined = StreamingOps.impressionClickJoin(
      Ingest.parseLenient(Ingest.fileRaw(spark, impDir)),
      Ingest.parseLenient(Ingest.fileRaw(spark, clkDir)))
    val out = runToMemory(joined, "imp_clk")
      .select("uuid", "ad_type").as[(String, Int)].collect().toSet
    assert(out == Set(("i1", 1)))
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    val in = writeInput(Seq(
      rec("u1", T0), rec("u1", T0 + 10000),     // session span 10s
      rec("u2", T0 + 5000),                     // singleton session
      rec("zz", T0 + 10 * 60000)))              // flush
    val events = StreamingOps.timedEvents(
      Ingest.parseLenient(Ingest.fileRaw(spark, in)))
    val q = StreamingOps.sessionize(events).writeStream
      .format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sessions")
      .select("uuid", "n_events", "span_ms")
      .as[(String, Long, Long)].collect().toSet
    assert(out.contains(("u1", 2L, 10000L)))
    assert(out.contains(("u2", 1L, 0L)))
  }

  test("streaming transitions: steps link across triggers; sliced replay equals the batch matrix") {
    import org.apache.spark.sql.functions._
    import graft.engine.Tables
    // (a) crafted cross-trigger linkage: u9's two events arrive in
    // different micro-batches — the stored last event must supply the
    // linking step
    val craft = tmpDir("trcraft")
    val mk = Seq(
      (9L, java.sql.Timestamp.valueOf("2021-01-01 10:00:00"), 1L, "view"),
      (9L, java.sql.Timestamp.valueOf("2021-01-01 10:05:00"), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    mk.filter(col("event_id") === 1).coalesce(1).write.parquet(s"$craft/s0")
    mk.filter(col("event_id") === 2).coalesce(1).write.parquet(s"$craft/s1")
    val cs = spark.readStream.schema(mk.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(craft)
    val got1 = runToMemory(
      graft.engine.StreamingOps.transitionStream(cs).toDF, "trans_craft")
      .as[(Long, String, String)].collect().toSet
    assert(got1 == Set((9L, "view", "click")))
    // (b) the maintenance claim: replaying the fixture in three
    // event-time-ordered slices reproduces the batch matrix exactly
    // (no eviction within the replay horizon)
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val sliced = ev.withColumn("slice",
      ntile(3).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val srcDir = tmpDir("trsrc")
    (1 to 3).foreach { s =>
      sliced.filter(col("slice") === s).drop("slice")
        .coalesce(1).write.parquet(s"$srcDir/s$s")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(srcDir)
    val steps = runToMemory(graft.engine.StreamingOps
        .transitionStream(stream, idleEvictMillis = 1000L * 86400 * 3650)
        .toDF, "trans_full")
    val got = steps.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val expect = graft.engine.Relational.qTransitionMatrix(spark, sf0001)
      .select(col("prev_type"), col("next_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("streaming SCD2: cross-trigger close; sliced replay equals batch closed rows") {
    import org.apache.spark.sql.functions._
    import graft.engine.Tables
    // (a) crafted: u9 opens state "view" in trigger 1; trigger 2's
    // "click" must CLOSE it with valid_to = the click's micros
    val craft = tmpDir("scd2craft")
    val mk = Seq(
      (9L, java.sql.Timestamp.valueOf("2021-01-01 10:00:00"), 1L, "view"),
      (9L, java.sql.Timestamp.valueOf("2021-01-01 10:05:00"), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    mk.filter(col("event_id") === 1).coalesce(1).write.parquet(s"$craft/s0")
    mk.filter(col("event_id") === 2).coalesce(1).write.parquet(s"$craft/s1")
    val cs = spark.readStream.schema(mk.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(craft)
    val got1 = runToMemory(
      graft.engine.StreamingOps.scd2Stream(cs).toDF, "scd2_craft")
      .as[(Long, String, Long, Long)].collect().toSet
    val t0us = java.sql.Timestamp.valueOf("2021-01-01 10:00:00")
      .getTime * 1000L
    val t1us = java.sql.Timestamp.valueOf("2021-01-01 10:05:00")
      .getTime * 1000L
    assert(got1 == Set((9L, "view", t0us, t1us)))
    // (b) the maintenance claim: replaying the fixture in three
    // event-time-ordered slices emits EXACTLY the batch build's
    // closed intervals (valid_to IS NOT NULL rows)
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val sliced = ev.withColumn("slice",
      ntile(3).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val srcDir = tmpDir("scd2src")
    (1 to 3).foreach { s =>
      sliced.filter(col("slice") === s).drop("slice")
        .coalesce(1).write.parquet(s"$srcDir/s$s")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(srcDir)
    val got = runToMemory(graft.engine.StreamingOps
        .scd2Stream(stream, idleEvictMillis = 1000L * 86400 * 3650)
        .toDF, "scd2_full")
      .as[(Long, String, Long, Long)].collect().toSet
    val expect = graft.engine.Relational.qScd2(spark, sf0001)
      .filter(col("valid_to_us").isNotNull)
      .select(col("user_id"), col("state"),
        col("valid_from_us"), col("valid_to_us"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("streaming attribution: cross-trigger carry, staleness cut; sliced replay equals batch") {
    import org.apache.spark.sql.functions._
    import graft.engine.Tables
    // (a) crafted: u9's click in trigger 1 attributes the purchase in
    // trigger 2 (cross-trigger carry); the purchase in trigger 3 sits
    // 80 h past the touch — beyond the 72 h window — and must emit
    // ORGANIC (null attribution), not a stale touch
    val craft = tmpDir("attrcraft")
    val t0 = java.sql.Timestamp.valueOf("2021-01-01 10:00:00")
    def plus(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val mk = Seq(
      (9L, t0, 1L, "click", 5.0),
      (9L, plus(300000L), 2L, "purchase", 7.0),
      (9L, plus(1000L * 3600 * 80), 3L, "purchase", 9.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    (1L to 3L).foreach { i =>
      mk.filter(col("event_id") === i).coalesce(1)
        .write.parquet(s"$craft/s$i")
    }
    val cs = spark.readStream.schema(mk.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(craft)
    val got1 = runToMemory(graft.engine.StreamingOps
        .attributionStream(cs, idleEvictMillis = 1000L * 86400 * 3650)
        .toDF, "attr_craft")
      .as[(Long, Long, Long, Double, Option[Long], Option[String],
        Option[Long])].collect().toSet
    val t0us = t0.getTime * 1000L
    assert(got1 == Set(
      (2L, 9L, t0us + 300000000L, 7.0, Some(1L), Some("click"),
        Some(300L)),
      (3L, 9L, t0us + 1000000L * 3600 * 80, 9.0, None, None, None)))
    // (b) the maintenance claim: replaying the fixture in three
    // event-time-ordered slices emits EXACTLY the batch attribution
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val sliced = ev.withColumn("slice",
      ntile(3).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val srcDir = tmpDir("attrsrc")
    (1 to 3).foreach { s =>
      sliced.filter(col("slice") === s).drop("slice")
        .coalesce(1).write.parquet(s"$srcDir/s$s")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(srcDir)
    val got = runToMemory(graft.engine.StreamingOps
        .attributionStream(stream, idleEvictMillis = 1000L * 86400 * 3650)
        .toDF, "attr_full")
      .as[(Long, Long, Long, Double, Option[Long], Option[String],
        Option[Long])].collect().toSet
    val expect = graft.engine.Relational.qAttribution(spark, sf0001)
      .as[(Long, Long, Long, Double, Option[Long], Option[String],
        Option[Long])].collect().toSet
    assert(got == expect && got.nonEmpty)
    // both branches crossed the stream too
    assert(got.exists(_._5.isDefined) && got.exists(_._5.isEmpty))
  }

  test("streaming doc pipeline: batch-identical features, quality floor, content dedup") {
    import org.apache.spark.sql.functions.col
    import graft.engine.{TextOps, TimeOps}
    val good = "the quick brown fox jumps over the lazy dog and runs " +
      "to the hills with a friend of mine that is nice"
    val good2 = "a stream of documents arrives and the engine keeps " +
      "the clean ones that pass the bar of quality in time"
    val junk = "%%% ### !!! @@@"
    val dir = tmpDir("docs")
    def row(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    Files.write(Paths.get(dir, "in.jsonl"), Seq(
      row(1, good, T0), row(2, good2, T0 + 1000),
      row(3, good, T0 + 2000), // same content, later arrival → dropped
      row(4, junk, T0 + 3000)) // below the quality floor → dropped
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts LONG").json(dir)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    val out = runToMemory(StreamingOps.docPipeline(docs), "doc_pipe")
      .select("doc_id", "fp", "quality", "n_tokens", "language")
      .as[(Long, String, Double, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L, 2L))
    // features are the SAME codegen'd expressions as the batch path —
    // bit-identical on the same text
    val batch = Seq((1L, good), (2L, good2)).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")),
        TextOps.qualityScore(col("text")),
        TextOps.tokenCount(col("text")).cast("long"),
        TextOps.langId(col("text")))
      .as[(Long, String, Double, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == batch)
    // and the junk doc really was a quality kill, not a dedup one
    val junkQ = Seq(junk).toDF("text")
      .select(TextOps.qualityScore(col("text"))).as[Double].head()
    assert(junkQ < 0.25)
  }

  test("incremental doc pipeline: history-Bloom hits dropped, stream dedup intact") {
    import org.apache.spark.sql.functions.col
    import graft.engine.{TextOps, TimeOps}
    val seen = "this document was already ingested last month and " +
      "sits in the historical corpus with all of its words intact"
    val fresh = "a brand new document arrives on the stream today and " +
      "must survive both the history probe and the quality floor"
    val fresh2 = "another new arrival with different content that the " +
      "history sketch has never seen before in any batch"
    val dir = tmpDir("incrdocs")
    def row(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    Files.write(Paths.get(dir, "in.jsonl"), Seq(
      row(1, seen, T0),             // in history → dropped by the probe
      row(2, fresh, T0 + 1000),
      row(3, fresh, T0 + 2000),     // in-stream dup → watermark dedup
      row(4, fresh2, T0 + 3000))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    // the history sketch through the ONE sanctioned build path —
    // HistorySketch owns the xxhash64 key derivation (r19 ADVICE)
    val hist = graft.engine.HistorySketch.build(
      Seq(seen).toDF("text")
        .select(TextOps.fingerprint(col("text")).as("fp")))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts LONG").json(dir)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    val out = runToMemory(
      StreamingOps.incrementalDocPipeline(docs, hist), "incr_pipe")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 4L))
  }

  test("streaming near-dup: later copy loses every band; short docs pass through") {
    import org.apache.spark.sql.functions.col
    import graft.engine.TimeOps
    val textA = "the quick brown fox jumps over the lazy dog and runs " +
      "to the hills with a friend of mine that is nice today"
    val other = "a completely different document about engines and " +
      "pipelines that shares no shingles with the fox at all"
    val flush = "this late flusher advances the watermark far enough " +
      "for every earlier verdict to emit from the stateful count"
    val dir = tmpDir("neardup")
    def row(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    // two FILES processed one per micro-batch: the copy arrives a
    // trigger later, so the original's bucket claims are already
    // state (same-trigger copies may split buckets — scaladoc'd)
    Files.write(Paths.get(dir, "a_first.jsonl"), Seq(
      row(1, textA, T0), row(3, other, T0 + 1000),
      row(4, "two tokens", T0 + 2000)) // < 3 tokens → no shingles
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.write(Paths.get(dir, "b_second.jsonl"), Seq(
      row(2, textA, T0 + 3000), // identical content → all bands lost
      row(9, flush, T0 + 30 * 60000L))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts LONG")
      .option("maxFilesPerTrigger", "1").json(dir)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    val out = runToMemory(StreamingOps.nearDupStream(docs), "neardup_stream")
      .select("doc_id", "n_bands").as[(Long, Long)].collect().toMap
    // 1 kept (all 32 bands), 3 kept, 4 passthrough (0 bands); the
    // copy 2 dropped; the flusher's own verdict is still pending
    assert(out == Map(1L -> 32L, 3L -> 32L, 4L -> 0L))
  }

  test("ANN index maintenance: incrementally-appended index equals the batch build") {
    import org.apache.spark.sql.functions.col
    import graft.engine.Similarity
    // frozen parameters: what the batch build derived for this corpus
    val (cent, bits) = Similarity.annIndexParams(spark, sf0001)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    // arrival order: three slices landing as separate files, processed
    // one per micro-batch (maxFilesPerTrigger) — the incremental path
    val srcDir = tmpDir("annsrc")
    emb.filter(col("vec_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$srcDir/s0")
    emb.filter(col("vec_id") % 3 === 1).coalesce(1)
      .write.parquet(s"$srcDir/s1")
    emb.filter(col("vec_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$srcDir/s2")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val outDir = tmpDir("annidx")
    val q = graft.engine.StreamingOps.annIndexAppend(
      stream, cent, bits, s"$outDir/index", s"$outDir/ckpt")
    q.awaitTermination()
    val got = graft.engine.StreamingOps
      .loadAnnIndex(spark, s"$outDir/index")
      .as[(Long, Seq[Double], Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    val expected = emb.select(Similarity.indexProjection(cent, bits): _*)
      .as[(Long, Seq[Double], Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty && got == expected)
    // and the layout really is posting lists: one directory per cell
    val cells = new java.io.File(s"$outDir/index").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid="))
    assert(cells.nonEmpty)
    assert(cells.toSet == expected.map(r => s"cid=${r._4}").toSet)
  }

  test("cluster-label maintenance: sliced edge stream equals batch components; replay is a no-op") {
    import org.apache.spark.sql.functions.col
    // edges = the verified near-dup pair graph at sf0.001, sliced in
    // three by ida — cross-slice components force real merges (a
    // component whose edges span slices must re-label across batches)
    val pairs = graft.engine.Dedup
      .qDedupMinhash(spark, sf0001)
      .select(col("ida"), col("idb"))
    val srcDir = tmpDir("cedges")
    (0 to 2).foreach { i =>
      pairs.filter(col("ida") % 3 === i).coalesce(1)
        .write.parquet(s"$srcDir/s$i")
    }
    val stream = spark.readStream.schema(pairs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val stateDir = tmpDir("cstate")
    val q = graft.engine.StreamingOps.clustersSink(
      stream, stateDir, tmpDir("cckpt"))
    q.awaitTermination()
    val got = graft.engine.StreamingOps.loadClusters(spark, stateDir)
      .as[(Long, Long)].collect().toSeq.sorted
    val expect = graft.engine.Dedup.qDedupClusters(spark, sf0001)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // replaying a slice is algebraically a no-op (connectivity union
    // is idempotent; min-id labels unchanged)
    graft.engine.StreamingOps.applyClustersBatch(
      spark.read.parquet(s"$srcDir/s0"), stateDir)
    val replayed = graft.engine.StreamingOps.loadClusters(spark, stateDir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(replayed == expect)
    // crash recovery: a COMPLETE orphaned staging is promoted, then
    // re-merging reaches the same fixpoint
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$stateDir/mv"),
      new org.apache.hadoop.fs.Path(s"$stateDir/mv_staging"))
    graft.engine.StreamingOps.applyClustersBatch(
      spark.read.parquet(s"$srcDir/s1"), stateDir)
    val recovered = graft.engine.StreamingOps.loadClusters(spark, stateDir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(recovered == expect)
    // and the forced-distributed merge path labels identically
    graft.engine.StreamingOps.applyClustersBatch(
      spark.read.parquet(s"$srcDir/s2"), stateDir, driverEdgeLimit = -1L)
    val dist = graft.engine.StreamingOps.loadClusters(spark, stateDir)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(dist == expect)
  }

  test("priority-sample maintenance: sliced stream equals batch sample; replay is a no-op") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val srcDir = tmpDir("psrc")
    (0 to 2).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.parquet(s"$srcDir/s$i")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val stateDir = tmpDir("pstate")
    val q = graft.engine.StreamingOps.prioritySampleSink(
      stream, stateDir, tmpDir("pckpt"))
    q.awaitTermination()
    val got = graft.engine.StreamingOps.loadPrioritySample(spark, stateDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expect = graft.engine.TextOps.qPrioritySample(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // replaying a slice is algebraically a no-op (idempotent merge)
    graft.engine.StreamingOps.applyPrioritySampleBatch(
      spark.read.parquet(s"$srcDir/s0"), stateDir)
    val replayed = graft.engine.StreamingOps
      .loadPrioritySample(spark, stateDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(replayed == expect)
    // crash recovery: a COMPLETE orphaned staging is promoted, then
    // re-merging reaches the same fixpoint
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$stateDir/mv"),
      new org.apache.hadoop.fs.Path(s"$stateDir/mv_staging"))
    graft.engine.StreamingOps.applyPrioritySampleBatch(
      spark.read.parquet(s"$srcDir/s1"), stateDir)
    val recovered = graft.engine.StreamingOps
      .loadPrioritySample(spark, stateDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(recovered == expect)
  }

  test("hist-quantile maintenance: sliced stream equals batch; replayed batch id is a no-op") {
    import org.apache.spark.sql.functions.col
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val srcDir = tmpDir("hsrc")
    (0 to 2).foreach { i =>
      ev.filter(col("event_id") % 3 === i).coalesce(1)
        .write.parquet(s"$srcDir/s$i")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val stateDir = tmpDir("hstate")
    val q = graft.engine.StreamingOps.histSink(
      stream, stateDir, tmpDir("hckpt"))
    q.awaitTermination()
    val got = graft.engine.StreamingOps.loadHistQuantile(spark, stateDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val expect = graft.engine.Relational.qHistQuantile(spark, sf0001)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expect && got.nonEmpty)
    // counts are a bag monoid: re-applying an ALREADY-SEEN batch id
    // must be a bookkept no-op (the double-count hazard the sampler's
    // set algebra doesn't have)
    graft.engine.StreamingOps.applyHistBatch(
      spark.read.parquet(s"$srcDir/s2"), stateDir, batchId = 0L)
    val replayed = graft.engine.StreamingOps
      .loadHistQuantile(spark, stateDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(replayed == expect)
    // while a genuinely NEW batch id does fold in (counts grow)
    graft.engine.StreamingOps.applyHistBatch(
      spark.read.parquet(s"$srcDir/s2"), stateDir, batchId = 99L)
    val grown = graft.engine.StreamingOps
      .loadHistQuantile(spark, stateDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(grown.map(_._3).sum > expect.map(_._3).sum)
    // and an EMPTY batch is a no-op, never a zero-row state overwrite
    // (the r16 cusum wedge's sibling path)
    graft.engine.StreamingOps.applyHistBatch(
      spark.read.parquet(s"$srcDir/s2").limit(0), stateDir, batchId = 100L)
    val afterEmpty = graft.engine.StreamingOps
      .loadHistQuantile(spark, stateDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(afterEmpty == grown, "empty batch mutated the hist state")
  }

  test("ANN index as a catalog table: per-cell compaction preserves rows, cuts files") {
    import org.apache.spark.sql.functions.col
    import graft.engine.Similarity
    val (cent, bits) = Similarity.annIndexParams(spark, sf0001)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    // three micro-batches → up to three files per touched cell: the
    // small-file grind the compactor exists for
    val srcDir = tmpDir("annctsrc")
    (0 to 2).foreach { m =>
      emb.filter(col("vec_id") % 3 === m).coalesce(1)
        .write.parquet(s"$srcDir/s$m")
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val outDir = tmpDir("annct")
    graft.engine.StreamingOps.annIndexAppend(
      stream, cent, bits, s"$outDir/index", s"$outDir/ckpt")
      .awaitTermination()
    graft.engine.StreamingOps.registerAnnIndexTable(
      spark, s"$outDir/index", "ann_idx_t")
    try {
      val before = spark.table("ann_idx_t")
        .as[(Long, Seq[Double], Seq[Long], Long)].collect().toSeq
        .sortBy(_._1)
      assert(before.nonEmpty)
      // pick a cell that actually accumulated multiple files
      val cells = new java.io.File(s"$outDir/index").listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cid="))
      val multi = cells.filter(
        _.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
      assert(multi.nonEmpty, "fixture produced no multi-file cell")
      val cid = multi.head.getName.stripPrefix("cid=")
      val (nBefore, nAfter) = graft.engine.Sinks.compactTablePartition(
        spark, "ann_idx_t", Seq("cid" -> cid))
      assert(nBefore >= 2 && nAfter < nBefore, s"$nBefore -> $nAfter")
      // the flip is invisible to readers: identical rows via the table
      val after = spark.table("ann_idx_t")
        .as[(Long, Seq[Double], Seq[Long], Long)].collect().toSeq
        .sortBy(_._1)
      assert(after == before)
    } finally spark.sql("DROP TABLE IF EXISTS ann_idx_t")
  }

  test("trending terms: a window's over-threshold terms emit exactly once") {
    import org.apache.spark.sql.functions.col
    import graft.engine.TimeOps
    val dir = tmpDir("trend")
    def row(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    // window 06:23: "spark" x3 (trending), "quiet" x2 (below bar);
    // next window gets one more "spark" that must NOT leak back
    Files.write(Paths.get(dir, "in.jsonl"), Seq(
      row(1, "spark spark quiet", T0),
      row(2, "spark quiet", T0 + 5000),
      row(3, "spark", T0 + 61000),
      row(9, "flush", T0 + 10 * 60000))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts LONG").json(dir)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    val out = runToMemory(StreamingOps.trendingTerms(docs), "trending")
      .select("w_start", "term", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val w2323 = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(T0 - T0 % 60000))
    assert(out == Set((w2323, "spark", 3L)))
  }

  test("streaming rollup sink: per-trigger MV merges equal the one-shot batch rollup; stale batch ids are skipped") {
    import org.apache.spark.sql.functions.{col, concat_ws, count, lit, sum, window}
    val baseDir = tmpDir("roll") + "/state"
    // raw events in two files = two micro-batches
    val rows1 = (0 until 60).map(i =>
      (i.toLong, T0 + (i % 3) * 3600000L, s"t${i % 2}", i * 1.25))
    val rows2 = (60 until 100).map(i =>
      (i.toLong, T0 + (i % 4) * 3600000L, s"t${i % 2}", i * 0.5))
    val inDir = tmpDir("roll-in")
    Seq(rows1, rows2).zipWithIndex.foreach { case (rs, i) =>
      val f = new java.io.File(inDir, s"ev$i.json")
      java.nio.file.Files.write(f.toPath, rs.map { case (id, ts, et, v) =>
        s"""{"event_id":$id,"ts":$ts,"event_type":"$et","value":$v}"""
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
      f.setLastModified(1700000000000L + i * 60000L)
    }
    def partials(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,4)")).as("psum"))
      .select(concat_ws("|", col("w.start").cast("string"),
        col("event_type")).as("gk"), col("pn"), col("psum"))
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1).json(inDir)
    val q = StreamingOps.rollupSink(stream, partials, baseDir,
      tmpDir("roll-ckpt"), nb = 8)
    q.awaitTermination()
    def state() = spark.read.parquet(baseDir)
      .select("gk", "pn", "psum")
      .as[(String, Long, java.math.BigDecimal)].collect().toSeq
      .map(r => (r._1, r._2, r._3.toPlainString)).sorted
    // one-shot batch rollup over ALL events — the monoid claim
    val all = spark.read
      .schema("event_id LONG, ts LONG, event_type STRING, value DOUBLE")
      .json(inDir)
    val expect = partials(all)
      .as[(String, Long, java.math.BigDecimal)].collect().toSeq
      .map(r => (r._1, r._2, r._3.toPlainString)).sorted
    assert(state() == expect && expect.nonEmpty)
    // replay protection: re-applying an already-applied batch id is
    // skipped (adding partials twice would double-count)
    StreamingOps.applyRollupBatch(partials(all), baseDir, batchId = 1, nb = 8)
    assert(state() == expect)
    // a NEW batch id does apply
    StreamingOps.applyRollupBatch(partials(all), baseDir, batchId = 2, nb = 8)
    assert(state().map(_._2).sum == 2 * expect.map(_._2).sum)
  }

  test("streaming budget admission: cross-trigger budget binds; replayed batch is a no-op") {
    import org.apache.spark.sql.functions.col
    val stateDir = tmpDir("adm") + "/state"
    val outDir = tmpDir("adm-out")
    val budget = 10L
    // source A: 4-token docs; batch 1 has two (8 tokens), batch 2 has
    // two more — only the first of them fits the remaining 2?? no:
    // 8 + 4 > 10, so batch 2 admits NOTHING for A; source B stays
    // under budget throughout
    val b1 = Seq((1L, "A", "a b c d", 100L), (2L, "A", "e f g h", 200L),
      (3L, "B", "x y", 100L))
    val b2 = Seq((4L, "A", "i j k l", 300L), (5L, "B", "z w", 300L))
    val inDir = tmpDir("adm-in")
    Seq(b1, b2).zipWithIndex.foreach { case (rs, i) =>
      val f = new java.io.File(inDir, s"d$i.json")
      java.nio.file.Files.write(f.toPath, rs.map { case (id, s, t, ts) =>
        s"""{"doc_id":$id,"source":"$s","text":"$t","ts":$ts}"""
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING, ts LONG")
      .option("maxFilesPerTrigger", 1).json(inDir)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    val q = StreamingOps.budgetAdmissionSink(stream, stateDir, outDir,
      tmpDir("adm-ckpt"), budget)
    q.awaitTermination()
    def admitted() = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSeq.sorted
    // A: docs 1,2 fill 8 of 10; doc 4 (4 tokens) would overflow →
    // dropped. B: 2 + 2 = 4 ≤ 10 → both admitted.
    assert(admitted() == Seq(1L, 2L, 3L, 5L))
    // replayed batch id: admission is not recomputed against the
    // already-updated totals (which would now reject doc 2)
    val replay = spark.read
      .schema("doc_id LONG, source STRING, text STRING, ts LONG")
      .json(new java.io.File(inDir, "d0.json").getPath)
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("ts")))
    StreamingOps.admitBudgetBatch(replay, stateDir, outDir, budget, batchId = 0)
    assert(admitted() == Seq(1L, 2L, 3L, 5L))
  }

  test("state-table crash recovery: a committed staging is finished, not re-merged") {
    import org.apache.spark.sql.functions.{col, lit}
    val nb = 4
    // --- upsert: crash between delete(live) and rename(staged) ---
    val upDir = tmpDir("crash-up") + "/state"
    val seed = (1L to 20L).map(k => (k, "A", k * 1.0, 0L))
      .toDF("key", "status", "price", "seq")
    StreamingOps.applyUpsertBatch(seed, upDir, nb)
    val kbOf = (1L to 20L).toDF("key")
      .select(col("key"), org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("key")),
        lit(nb.toLong)).as("kb"))
      .as[(Long, Long)].collect().toMap
    val b = kbOf(1L) // the bucket that will "crash mid-swap"
    val bKeys = kbOf.filter(_._2 == b).keys.toSeq.sorted
    // staged replacement content for bucket b: every key repriced
    val staged = bKeys.map(k => (k, "R", k * 10.0))
      .toDF("key", "status", "price").withColumn("kb", lit(b))
    val upStaging = new java.io.File(upDir).getParent + "/.state-upsert-staging"
    staged.write.partitionBy("kb").parquet(upStaging)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(upStaging, "_STAGED"))
    // the crash window: live bucket deleted, rename never ran — a
    // naive replay would rebuild the bucket from batch keys only
    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles.foreach(c => rmrf(c.getPath))
      f.delete()
    }
    rmrf(s"$upDir/kb=$b")
    StreamingOps.applyUpsertBatch(
      spark.emptyDataset[(Long, String, Double, Long)]
        .toDF("key", "status", "price", "seq"), upDir, nb)
    val got = spark.read.parquet(upDir).select("key", "status", "price")
      .as[(Long, String, Double)].collect().toSeq.sorted
    val expect = ((1L to 20L).filterNot(bKeys.contains)
      .map(k => (k, "A", k * 1.0)) ++ bKeys.map(k => (k, "R", k * 10.0)))
      .sorted
    assert(got == expect, s"bucket $b not recovered from staging")

    // --- rollup: crashed swap must NOT be re-merged (double count) ---
    val roDir = tmpDir("crash-ro") + "/state"
    val p0 = Seq(("g1", 5L, java.math.BigDecimal.valueOf(5.0)),
      ("g2", 3L, java.math.BigDecimal.valueOf(3.0)))
      .toDF("gk", "pn", "psum")
      .select(col("gk"), col("pn"), col("psum").cast("decimal(18,4)"))
    StreamingOps.applyRollupBatch(p0, roDir, batchId = 0, nb = nb)
    val gkb = Seq("g1").toDF("gk")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("gk")),
        lit(nb.toLong))).as[Long].head()
    // batch 1 added (g1, +2) and its swap crashed mid-way: staging
    // holds the MERGED bucket (7) and the live bucket is gone
    val roStaged = Seq(("g1", 7L, java.math.BigDecimal.valueOf(7.0)))
      .toDF("gk", "pn", "psum")
      .select(col("gk"), col("pn"), col("psum").cast("decimal(18,4)"))
      .withColumn("kb", lit(gkb))
    val roStaging = new java.io.File(roDir).getParent + "/.state-rollup-staging"
    roStaged.write.partitionBy("kb").parquet(roStaging)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(roStaging, "_STAGED"))
    rmrf(s"$roDir/kb=$gkb")
    // the replayed batch-1 partials: a re-merge would make g1 = 9
    val p1 = Seq(("g1", 2L, java.math.BigDecimal.valueOf(2.0)))
      .toDF("gk", "pn", "psum")
      .select(col("gk"), col("pn"), col("psum").cast("decimal(18,4)"))
    StreamingOps.applyRollupBatch(p1, roDir, batchId = 1, nb = nb)
    def roState() = spark.read.parquet(roDir).select("gk", "pn")
      .as[(String, Long)].collect().toSeq.sorted
    assert(roState() == Seq(("g1", 7L), ("g2", 3L)),
      "crashed rollup swap was re-merged (double count) or lost")
    // and the marker advanced: a second replay of id 1 is skipped
    StreamingOps.applyRollupBatch(p1, roDir, batchId = 1, nb = nb)
    assert(roState() == Seq(("g1", 7L), ("g2", 3L)))
  }

  test("streaming upsert sink: micro-batch merges reach the sequential end state; untouched buckets never rewritten; re-apply is a no-op") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val nb = 8
    val baseDir = tmpDir("ups") + "/state"
    // seed state: keys 1..40 inserted as one batch backfill
    val seed = (1L to 40L).map(k => (k, "A", k * 1.0, 0L))
      .toDF("key", "status", "price", "seq")
    StreamingOps.applyUpsertBatch(seed, baseDir, nb)
    // key → bucket under the sink's own hash (computed via Spark;
    // xxhash64 has no convenient JVM-side twin here)
    val kb = (1L to 60L).toDF("key")
      .select(col("key"), pmod(xxhash64(col("key")), lit(nb.toLong)).as("kb"))
      .as[(Long, Long)].collect().toMap
    // two change files = two micro-batches (maxFilesPerTrigger=1,
    // mtimes pinned so the file source replays them in order); key 5
    // is updated in BOTH (seq 1 then 2), key 41 inserted then updated
    val b1 = Seq((1L, "B", 101.0, 1L), (5L, "B", 105.0, 1L),
      (41L, "N", 41.0, 1L))
    val b2 = Seq((5L, "C", 205.0, 2L), (41L, "C", 141.0, 2L),
      (46L, "N", 46.0, 2L))
    val inDir = tmpDir("ups-in")
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val f = new java.io.File(inDir, s"batch$i.json")
      val lines = b.map { case (k, s, p, q) =>
        s"""{"key":$k,"status":"$s","price":$p,"seq":$q}"""
      }
      java.nio.file.Files.write(f.toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      f.setLastModified(1700000000000L + i * 60000L)
    }
    // an existing bucket no change key hashes to must survive
    // BYTE-identical — the partition-pruning claim as an observable
    val changedKb = (b1 ++ b2).map(r => kb(r._1)).toSet
    val quietKb = (0L until nb).find(b => !changedKb.contains(b)
      && kb.exists { case (k, v) => v == b && k <= 40 }).get
    def bucketState(b: Long): Seq[(String, Long, Long)] = {
      val d = new java.io.File(new java.net.URI(
        s"file:$baseDir/kb=$b"))
      d.listFiles.toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sorted
    }
    val quietBefore = bucketState(quietKb)
    val stream = spark.readStream
      .schema("key LONG, status STRING, price DOUBLE, seq LONG")
      .option("maxFilesPerTrigger", 1).json(inDir)
    val q = StreamingOps.upsertSink(stream, baseDir, tmpDir("ups-ckpt"), nb)
    q.awaitTermination()
    // sequential driver re-derivation of the final state
    var state = (1L to 40L).map(k => k -> (("A", k * 1.0))).toMap
    (b1 ++ b2).sortBy(_._4).foreach { case (k, s, p, _) =>
      state += k -> ((s, p))
    }
    val expect = state.toSeq.map { case (k, (s, p)) => (k, s, p) }.sorted
    def readState() = spark.read.parquet(baseDir)
      .select("key", "status", "price")
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(readState() == expect)
    assert(bucketState(quietKb) == quietBefore)
    // effectively-once: re-applying the last batch changes nothing
    StreamingOps.applyUpsertBatch(
      b2.toDF("key", "status", "price", "seq"), baseDir, nb)
    assert(readState() == expect)
  }

  test("cusum maintenance: sliced fold equals the sequential recursion; gap hours zero-filled; replay is a no-op") {
    val dir = tmpDir("cusum-mv")
    // k = 10/1. steady: exactly 10/h -> s pinned at 0. shifted: 10/h
    // for 60 h then 14/h (the sustained +40% a per-point bar misses).
    // gappy: 10/h with hour 45 MISSING entirely -> the spine must
    // charge it d = -k, not skip it.
    def c(ty: String, h: Int): Option[Long] = ty match {
      case "steady"  => Some(10L)
      case "shifted" => Some(if (h < 60) 10L else 14L)
      case "gappy"   => if (h == 45) None else Some(10L)
    }
    val types = Seq("steady", "shifted", "gappy")
    val series = for {
      ty <- types; h <- 0 until 90; v <- c(ty, h)
    } yield (ty, h.toLong, v)
    def recursion(ty: String, upto: Int): Long = {
      var s = 0L
      for (h <- 0 until upto)
        s = math.max(0L, s + c(ty, h).getOrElse(0L) - 10L)
      s
    }
    val slices = Seq(0 until 30, 30 until 60, 60 until 90)
    for ((sl, bid) <- slices.zipWithIndex) {
      val b = series.filter(r => sl.contains(r._2.toInt))
        .toDF("event_type", "h", "c")
      StreamingOps.applyCusumBatch(b, dir, bid.toLong, kNum = 10L, kDen = 1L)
      val got = StreamingOps.loadCusum(spark, dir, alarmScaled = 30L)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      for (ty <- types)
        assert(got(ty) == recursion(ty, sl.end),
          s"$ty after ${sl.end} h: ${got(ty)} != ${recursion(ty, sl.end)}")
    }
    val fin = StreamingOps.loadCusum(spark, dir, alarmScaled = 30L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!fin("steady") && !fin("gappy") && fin("shifted"),
      s"alarm states wrong: $fin")
    // replayed batch id: state unchanged
    val before = StreamingOps.loadCusum(spark, dir, 30L).collect().toSeq
      .map(_.toSeq).sortBy(_.toString)
    StreamingOps.applyCusumBatch(
      series.toDF("event_type", "h", "c"), dir, 2L, 10L, 1L)
    val after = StreamingOps.loadCusum(spark, dir, 30L).collect().toSeq
      .map(_.toSeq).sortBy(_.toString)
    assert(after == before, "replayed batch mutated the state")
    // an explicitly EMPTY batch (append mode's batch 0) must be a
    // no-op, not a zero-row state overwrite
    StreamingOps.applyCusumBatch(
      series.toDF("event_type", "h", "c").limit(0), dir, 99L, 10L, 1L)
    val afterEmpty = StreamingOps.loadCusum(spark, dir, 30L).collect()
      .toSeq.map(_.toSeq).sortBy(_.toString)
    assert(afterEmpty == before, "empty batch mutated the state")
  }

  test("cusumSink end-to-end: append-mode empty batch 0 does not wedge the state; restart replays clean") {
    // Watermarked append-mode aggs emit NOTHING in batch 0 (the
    // watermark lags one batch) — the r16 wedge folded that empty
    // frame into a zero-row MV whose null max(last_bid) NPE'd every
    // later batch AND every restart. This drives the real sink over a
    // two-file stream so the empty batch 0 is actually exercised.
    val hourUs = 3600000000L
    val h0 = 1617170400000000L / hourUs * hourUs // aligned hour ≤ T0
    def ev(ty: String, us: Long): String =
      s"""{"event_type":"$ty","ts_us":$us}"""
    val inDir = tmpDir("cusum-e2e-in")
    // hour 0: 5 events, hour 1: 1, hour 2: 4; k = 2/h ⇒ cusum
    // s₀ = 3, s₁ = 2, s₂ = 4 on the closed prefix
    val f1 = (0 until 5).map(i => ev("t", h0 + i * 60000000L)) ++
      Seq(ev("t", h0 + hourUs + 60000000L)) ++
      (0 until 4).map(i => ev("t", h0 + 2 * hourUs + i * 60000000L))
    // the flush record pushes the watermark far past hour 2; its own
    // window never closes, so type "flush" must NOT reach the state
    val f2 = Seq(ev("flush", h0 + 1000 * hourUs))
    for ((lines, i) <- Seq(f1, f2).zipWithIndex) {
      val f = new java.io.File(inDir, s"b$i.jsonl")
      Files.write(f.toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val stateDir = tmpDir("cusum-e2e-mv")
    val ckpt = tmpDir("cusum-e2e-ckpt")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_type STRING, ts_us LONG")
        .option("maxFilesPerTrigger", 1).json(inDir)
        .select($"event_type",
          org.apache.spark.sql.functions.timestamp_micros($"ts_us")
            .as("ts"))
      val q = StreamingOps.cusumSink(stream, stateDir, ckpt,
        kNum = 2L, kDen = 1L)
      q.awaitTermination() // pre-fix: StreamingQueryException (NPE)
    }
    run()
    val got = StreamingOps.loadCusum(spark, stateDir, alarmScaled = 30L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set("t"), s"state types: ${got.keySet}")
    assert(got("t") == ((h0 / hourUs + 2, 4L, false)), s"got: $got")
    // restart on the same checkpoint with no new data: replay-safe
    run()
    val again = StreamingOps.loadCusum(spark, stateDir, alarmScaled = 30L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(again == got, s"restart mutated the cusum state: $again")
  }
}
