package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A Bloom sketch of an immutable HISTORICAL corpus's canonical
  * fingerprints, keyed EXACTLY the way the streaming probe reads it —
  * built over `xxhash64(fp)` longs because the codegen'd
  * `might_contain` expression is long-typed
  * ([[Scale.bloomMightContain]]). The constructor is package-private
  * on purpose: the r19 probe-key migration (raw fp strings →
  * xxhash64 longs) showed that a raw `BloomFilter` parameter lets a
  * caller pass a sketch built under the OLD key scheme — it compiles
  * and runs while every probe misses, silently turning history dedup
  * into a no-op. Routing every build through [[HistorySketch.build]]
  * makes the key derivation single-sourced and the mismatch
  * unrepresentable. */
final class HistorySketch private[engine] (
    private[engine] val bf: org.apache.spark.util.sketch.BloomFilter)

object HistorySketch {
  /** Build the history sketch from a frame carrying the canonical
    * fingerprint column (default `fp` — [[TextOps.fingerprint]]
    * output). Distributed build: only the ~MB bit array reaches the
    * driver. `expectedItems < 0` pays one count pass for sizing —
    * pass the known history cardinality to skip it (a hard-coded
    * capacity would let fpp degrade toward 1 as history grows). */
  def build(historyFp: DataFrame, fpCol: String = "fp",
      expectedItems: Long = -1L, fpp: Double = 0.001): HistorySketch = {
    val n = if (expectedItems >= 0L) expectedItems else historyFp.count()
    new HistorySketch(historyFp
      .select(xxhash64(col(fpCol)).as("fph"))
      .stat.bloomFilter("fph", math.max(n, 1000L), fpp))
  }
}

/** A parsed ad-event with its derived event time (epoch millis →
  * seconds precision, F1–F3). */
case class TimedEvent(
    uuid: String,
    ad_type: Int,
    event_time: java.sql.Timestamp)

/** One closed session per uuid emitted by the stateful sessionizer. */
case class SessionOut(
    uuid: String,
    n_events: Long,
    span_ms: Long)

/** A user-journey event for the streaming transition maintainer. */
case class UserEvent(
    user_id: Long,
    ts: java.sql.Timestamp,
    event_id: Long,
    event_type: String)

/** One observed (prev → next) journey step. */
case class TransitionOut(
    user_id: Long,
    prev_type: String,
    next_type: String)

/** One CLOSED SCD2 validity interval (the open interval lives in
  * keyed state until the next state change closes it). */
case class Scd2Out(
    user_id: Long,
    state: String,
    valid_from_us: Long,
    valid_to_us: Long)

/** A valued user event for the streaming attribution maintainer. */
case class ValuedEvent(
    user_id: Long,
    ts: java.sql.Timestamp,
    event_id: Long,
    event_type: String,
    value: Double)

/** One streamed conversion with its last-touch attribution (touch
  * columns null when the latest touch is stale or absent — organic,
  * the batch [[graft.engine.Relational.qAttribution]] contract). */
case class AttributionOut(
    purchase_id: Long,
    user_id: Long,
    purchase_t_us: Long,
    value: Double,
    touch_id: Option[Long],
    touch_type: Option[String],
    gap_s: Option[Long])

/** Streaming transformations beyond the reference's pass-through
  * pipelines (SURVEY.md §2.5/§2.8 note these as absent in the
  * reference but part of the rebuild surface): event-time windowed
  * aggregation, session windows, and arbitrary keyed state via
  * `flatMapGroupsWithState`.
  *
  * Scale notes: all three shuffle once on the grouping key and keep
  * per-key state in the state store (RocksDB-backed when configured,
  * SURVEY §2.8 T3); the watermark bounds state size — windows/
  * sessions older than the watermark are evicted, so state is
  * O(active keys), not O(stream history).
  */
object StreamingOps {

  /** Parsed stream → typed events with derived event time. */
  def timedEvents(parsed: DataFrame): Dataset[TimedEvent] = {
    import parsed.sparkSession.implicits._
    parsed.select(
        col("uuid"), col("ad_type"),
        TimeOps.eventTimeFromMillis(col("timestamp")).as("event_time"))
      .as[TimedEvent]
  }

  /** Tumbling-window counts per ad_type with a 5 s watermark — the
    * canonical streaming aggregation. In append mode a window emits
    * exactly once, when the watermark passes its end. */
  def windowedCounts(parsed: DataFrame,
      windowDur: String = "1 minute",
      slide: Option[String] = None): DataFrame =
    parsed
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("timestamp")))
      .withWatermark("event_time", "5 seconds")
      .groupBy(window(col("event_time"), windowDur,
        slide.getOrElse(windowDur)), col("ad_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("ad_type"), col("n"))

  /** Session-window (gap-based) event counts per uuid. */
  def sessionCounts(parsed: DataFrame, gap: String = "30 seconds"): DataFrame =
    parsed
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("timestamp")))
      .withWatermark("event_time", "5 seconds")
      .groupBy(session_window(col("event_time"), gap), col("uuid"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("uuid"), col("n"))

  /** Streaming exact dedup: first occurrence per uuid wins, with
    * state bounded by the watermark — `dropDuplicatesWithinWatermark`
    * evicts a key's dedup state once the watermark passes its event
    * time + delay, so state is O(keys per watermark horizon), not
    * O(stream history). The streaming twin of [[Dedup.qDedupExact]]:
    * at 100 TB/day ingest this is the dedup that runs ON the stream,
    * with the batch MinHash/cluster passes downstream. */
  def dedupStream(parsed: DataFrame,
      watermarkDelay: String = "5 seconds"): DataFrame =
    parsed
      .withColumn("event_time", TimeOps.eventTimeFromMillis(col("timestamp")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("uuid")

  /** Streaming corpus ingestion: the batch text surface applied
    * incrementally — per-document features (token count, quality,
    * language, canonical fingerprint) as STATELESS projections using
    * the exact same codegen'd expressions as the batch [[TextOps]]
    * queries, a quality floor, then watermark-bounded exact dedup
    * keyed on the content fingerprint. A duplicate arriving within
    * the horizon is dropped exactly; an older re-arrival is the
    * periodic batch dedup pass's job — bounded state is the price of
    * streaming (state is O(docs inside the horizon), watermark-
    * evicted, RocksDB-backed when configured), the same trade the
    * reference makes with its partition-commit delay. Input must
    * carry (doc_id, text, event_time). */
  def docPipeline(docs: DataFrame, watermarkDelay: String = "10 minutes",
      minQuality: Double = 0.25): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
      .withColumn("language", TextOps.langId(col("text")))
      .filter(col("quality") >= minQuality)
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** The INCREMENTAL-INGEST streaming posture
    * ([[Dedup.qDedupIncremental]]'s twin): the live document stream
    * deduped BOTH within itself (the watermark-bounded exact dedup
    * above) and against an immutable HISTORICAL corpus, represented
    * by a Bloom sketch built offline by the batch side over the
    * XXHASH64 of its fingerprints (exactly the
    * [[Dedup.incrementalKeep]] build — the codegen'd probe expression
    * is long-typed, see [[Scale.bloomMightContain]]). The probe is a
    * STATELESS filter, so streaming state stays O(docs inside the
    * horizon) no matter how large history grows — the sketch is the
    * only history the executors ever hold. False positives (rate =
    * the sketch's configured fpp plus the 64-bit pre-hash's collision
    * rate) drop a genuinely-new document; that is the documented
    * trade of the always-on path, and the periodic batch
    * [[Dedup.qDedupIncremental]] pass over the same day's files is
    * the exact reconciliation (its anti-join absorbs false
    * positives).
    *
    * The sketch parameter is the [[HistorySketch]] wrapper, NOT a raw
    * BloomFilter: when the probe moved to the long-typed codegen'd
    * expression (r19) the build keys silently changed from raw fp
    * strings to xxhash64(fp) longs, and a caller still passing a
    * string-keyed sketch would compile and run while every probe
    * missed — history dedup degrading to a no-op with no error
    * anywhere. The wrapper pins key derivation to ONE place
    * ([[HistorySketch.build]]); an old-style sketch no longer
    * typechecks (r19 ADVICE). */
  def incrementalDocPipeline(docs: DataFrame,
      history: HistorySketch,
      watermarkDelay: String = "10 minutes",
      minQuality: Double = 0.25): DataFrame =
    docPipeline(docs, watermarkDelay, minQuality)
      .filter(!Scale.bloomMightContain(history.bf, xxhash64(col("fp"))))

  /** Windowed trending terms — the streaming twin of the batch
    * heavy-hitters ([[TextOps.qHeavyHitters]]): doc-stream tokens
    * exploded and counted per (tumbling window, term); only terms
    * reaching `minCount` inside their window emit. Append mode ⇒ each
    * window's trending set emits exactly once, when the watermark
    * passes window end. State is the open windows' partial counts —
    * watermark-evicted, O(distinct terms per open window); when the
    * per-window vocabulary is itself unbounded, production fronts
    * this with the per-partition lossy candidate sketch
    * ([[TextOps.lossyCandidates]]) so only candidates reach the
    * stateful agg. Input must carry (text, event_time);
    * `watermarkDelay` is the late-data tolerance — tune it with
    * `windowDur` (a long window with a short delay silently drops
    * late tokens). */
  def trendingTerms(docs: DataFrame, windowDur: String = "1 minute",
      minCount: Long = 3L, watermarkDelay: String = "5 seconds"): DataFrame =
    docs
      .withWatermark("event_time", watermarkDelay)
      .select(col("event_time"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(window(col("event_time"), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("w_start"), col("term"), col("n"))

  /** Stream–stream inner join: impressions ⋈ clicks on uuid with the
    * click constrained to [impression, impression + window]. BOTH
    * sides are watermarked and the join condition bounds event-time
    * distance, so each side's buffered state is evicted as the
    * watermark advances — the only join shape that runs unbounded
    * streams with bounded state. */
  def impressionClickJoin(impressions: DataFrame, clicks: DataFrame,
      window: String = "1 minute"): DataFrame = {
    val imp = impressions
      .withColumn("imp_time", TimeOps.eventTimeFromMillis(col("timestamp")))
      .select(col("uuid"), col("ad_type"), col("imp_time"))
      .withWatermark("imp_time", "5 seconds")
    val clk = clicks
      .withColumn("clk_time", TimeOps.eventTimeFromMillis(col("timestamp")))
      .select(col("uuid").as("c_uuid"), col("clk_time"))
      .withWatermark("clk_time", "5 seconds")
    imp.join(clk,
      col("uuid") === col("c_uuid") &&
        col("clk_time") >= col("imp_time") &&
        col("clk_time") <= col("imp_time") + expr(s"INTERVAL $window"))
      .select(col("uuid"), col("ad_type"), col("imp_time"), col("clk_time"))
  }

  /** STREAMING MinHash NEAR-dup filter: the candidate-generation half
    * of [[Dedup.qDedupMinhash]] run ON the stream — a document is
    * kept iff NONE of its 32 LSH band buckets was claimed by an
    * earlier in-horizon document. Signatures come from the exact
    * batch recipe (shared [[Dedup.minhashSigOf]] + the shared
    * [[Dedup.bandKeyCols]] banding, so stream and batch bucket
    * identically); `dropDuplicatesWithinWatermark` keyed on
    * (band, sig) keeps each bucket's first claimant, and a doc
    * surviving on ALL of its bands introduced every one of them —
    * i.e. collided with nobody. The per-doc count is a watermarked
    * streaming agg, so a verdict emits once the watermark passes the
    * doc's event time (the same latency trade every append-mode agg
    * makes). Docs too short to shingle can never be near-dup
    * candidates (the batch path's rule) and pass through the
    * stateless branch immediately, flagged `n_bands = 0`.
    *
    * Honesty: this is the CANDIDATE filter only — no exact-Jaccard
    * verify on the stream, so a band collision below the 0.8
    * threshold drops a genuinely-new doc (the banding's false-
    * positive rate); arrival order, not min doc_id, picks the kept
    * copy; collisions straddling the watermark horizon are missed;
    * and two near-dups landing in the SAME micro-batch can split
    * their buckets (`dropDuplicatesWithinWatermark` has no
    * within-trigger order) so that neither reaches a full band
    * count — over-deletion, never under. All four are the documented
    * price of the always-on path — the periodic batch
    * [[Dedup.qDedupMinhash]] + [[Dedup.qDedupClusters]] pass is the
    * exact reconciliation, precisely the [[incrementalDocPipeline]]
    * posture at near-dup rather than exact-dup granularity. State:
    * 32 band keys + one count per in-horizon doc, watermark-evicted.
    *
    * Input must carry (doc_id, text, event_time). Output: kept docs
    * (doc_id, event_time, n_bands). */
  def nearDupStream(docs: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = 64
    val bands = 32
    val ab = Dedup.minhashCoeffsFor(k)
    val sigs = docs.select(col("doc_id"), col("event_time"), col("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        it.map { case (id, ts, text) =>
          val sh = Dedup.shingleHashesOfText(text, 3)
          (id, ts, Dedup.minhashSigOf(sh, k, ab))
        }
      }
      .toDF("doc_id", "event_time", "sig")
    val shingled = sigs.filter(size(col("sig")) > 0)
    val kept = shingled
      .select(col("doc_id"), col("event_time"),
        explode(array(Dedup.bandKeyCols(bands): _*)).as("bk"))
      .select(col("doc_id"), col("event_time"),
        col("bk.band").as("band"), col("bk.sig").as("bsig"))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("band", "bsig")
      .groupBy(col("doc_id"), col("event_time"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") === bands)
    val passthrough = sigs.filter(size(col("sig")) === 0)
      .select(col("doc_id"), col("event_time"), lit(0L).as("n_bands"))
    kept.union(passthrough)
  }

  /** STREAMING ANN-INDEX MAINTENANCE: append-stamp arriving vectors
    * into the fused IVF+LSH index layout ([[Similarity.annIndex]]'s
    * row shape) with FROZEN parameters — the incremental-ingest
    * posture for retrieval, completing the triangle with
    * [[incrementalDocPipeline]] (dedup) and the batch rebuild.
    *
    * Design: indexing a vector is a pure projection of its row
    * (signatures are hyperplane signs, the cell is an argmax against
    * driver-resident centroids — [[Similarity.indexProjection]], the
    * SAME column expressions the batch build plans), so the stream
    * needs no state store at all: each micro-batch is a stateless
    * codegen'd map appended to the index files. The parquet file
    * sink's transaction log gives exactly-once appends across
    * restarts; `partitionBy(cid)` lays rows out as IVF posting lists
    * (a probe reads only its cells' directories — partition pruning
    * is the serving-side payoff), and the micro-batch small-files
    * grind is the exact problem the reference-side Hive sink's
    * auto-compaction already solves ([[Sinks]] K5) — run it per cell
    * directory on the same schedule.
    *
    * The parameters are FROZEN by contract ([[Similarity
    * .annIndexParams]]): stamping with the live corpus size would
    * silently re-bucket the stream away from the index it extends.
    * Growth is absorbed by bucket occupancy (recall unaffected —
    * tables and probes are unchanged; per-bucket cost degrades
    * gradually as n outgrows the frozen width) until the periodic
    * batch rebuild re-derives (centroids, bits) at the new n. */
  def annIndexAppend(vecs: DataFrame,
      cent: IndexedSeq[(Long, IndexedSeq[Double])], bits: Int,
      outDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.select(Similarity.indexProjection(cent, bits): _*)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cid")
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Merge ONE micro-batch into the priority-sample MV
    * ([[TextOps.qPrioritySample]]'s streaming half): score the batch
    * exactly like the batch pass ([[TextOps.priorityScoredOf]] —
    * deterministic md5 priorities, no RNG), take its top-(k+1), and
    * re-rank against the stored k+1 rows.
    *
    * Replay safety comes from ALGEBRA, not bookkeeping: under SET
    * semantics the top-(k+1) merge is idempotent, commutative and
    * associative (priorities are a pure function of the doc), so
    * re-applying any batch — foreachBatch is at-least-once, and
    * retries/replays DO happen — or promoting a crash-orphaned
    * staged merge and then re-applying cannot change the fixpoint.
    * The `dropDuplicates(doc_id)` inside the merge is what MAKES it
    * set semantics: with plain bag union a replayed doc would sit in
    * the MV twice and shove real candidates below τ (caught by the
    * sliced-replay spec). The only machinery needed is the staged
    * swap that keeps readers off partial state: write staging
    * (+_SUCCESS), swap under the live path, and at entry promote any
    * COMPLETE orphaned staging (safe by the same idempotence) or
    * drop an incomplete one. */
  def applyPrioritySampleBatch(batch: DataFrame, stateDir: String,
      k: Int = TextOps.prioritySampleK): Unit = {
    val spark = batch.sparkSession
    val basePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(basePath)
    val mv = new org.apache.hadoop.fs.Path(basePath, "mv")
    val staging = new org.apache.hadoop.fs.Path(basePath, "mv_staging")
    val old = new org.apache.hadoop.fs.Path(basePath, "mv_old")
    val success = new org.apache.hadoop.fs.Path(staging, "_SUCCESS")
    // crash recovery: a complete staged merge is promoted (idempotent
    // — re-merging the replayed batch reaches the same fixpoint); an
    // incomplete one is dropped
    if (fs.exists(success)) {
      fs.delete(mv, true); fs.rename(staging, mv)
    } else fs.delete(staging, true)
    fs.delete(old, true)
    def top(df: DataFrame): DataFrame =
      df.orderBy(col("prio").desc, col("doc_id")).limit(k + 1)
    val scored = top(TextOps.priorityScoredOf(batch))
    val merged =
      if (fs.exists(mv))
        top(spark.read.parquet(mv.toString).unionByName(scored)
          .dropDuplicates("doc_id"))
      else scored
    merged.coalesce(1).write.parquet(staging.toString)
    if (fs.exists(mv)) fs.rename(mv, old)
    fs.rename(staging, mv)
    fs.delete(old, true)
  }

  /** Merge ONE micro-batch of near-dup EDGES into the cluster-label
    * MV ([[Dedup.qDedupClustersIncremental]]'s streaming half): the
    * stored (id, label) rows are re-read as a spanning star forest of
    * the historical components, unioned with the batch's edges, and
    * re-labeled by [[Dedup.labelComponents]] — the historical PAIR
    * GRAPH is never rescanned; the merge input is \|labels\| + \|Δ\|
    * rows (duplicate-sized, not corpus-sized).
    *
    * Replay safety comes from ALGEBRA, the
    * [[applyPrioritySampleBatch]] discipline: connectivity union is
    * idempotent — re-applying a replayed batch (foreachBatch is
    * at-least-once) adds edges whose endpoints are already connected,
    * and the min-id label of every component is unchanged, so the MV
    * reaches the same fixpoint. Crash recovery is the same staged
    * swap: promote a COMPLETE orphaned staging (safe by idempotence),
    * drop an incomplete one. */
  def applyClustersBatch(batchEdges: DataFrame, stateDir: String,
      driverEdgeLimit: Long = 1000000L): Unit = {
    val spark = batchEdges.sparkSession
    val basePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(basePath)
    val mv = new org.apache.hadoop.fs.Path(basePath, "mv")
    val staging = new org.apache.hadoop.fs.Path(basePath, "mv_staging")
    val old = new org.apache.hadoop.fs.Path(basePath, "mv_old")
    val success = new org.apache.hadoop.fs.Path(staging, "_SUCCESS")
    if (fs.exists(success)) {
      fs.delete(mv, true); fs.rename(staging, mv)
    } else fs.delete(staging, true)
    fs.delete(old, true)
    val edges = batchEdges.select(col("ida"), col("idb"))
    val merged = Dedup.labelComponents(
      if (fs.exists(mv))
        spark.read.parquet(mv.toString)
          .select(col("id").as("ida"), col("label").as("idb"))
          .unionByName(edges)
      else edges,
      driverEdgeLimit)
    merged.coalesce(1).write.parquet(staging.toString)
    if (fs.exists(mv)) fs.rename(mv, old)
    fs.rename(staging, mv)
    fs.delete(old, true)
  }

  /** Always-on cluster-label maintenance: each micro-batch of
    * (ida, idb) near-dup edges folds into the label MV via
    * [[applyClustersBatch]]. */
  def clustersSink(edges: DataFrame, stateDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, _: Long) =>
        applyClustersBatch(b, stateDir))
      .trigger(trigger)
      .start()

  /** Read the cluster-label MV back as (doc_id, cluster_id). */
  def loadClusters(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/mv")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))

  /** Always-on priority-sample maintenance: each micro-batch of
    * (doc_id, text) documents folds into the k+1-row MV via
    * [[applyPrioritySampleBatch]]. */
  def prioritySampleSink(docs: DataFrame, stateDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, _: Long) =>
        applyPrioritySampleBatch(b, stateDir))
      .trigger(trigger)
      .start()

  /** Merge ONE micro-batch of raw events into the histogram-quantile
    * MV ([[Relational.qHistQuantile]]'s streaming half). Replay
    * safety here comes from BOOKKEEPING, not algebra — the deliberate
    * contrast with [[applyPrioritySampleBatch]]: per-bucket counts
    * are a bag monoid, so re-applying a replayed batch (foreachBatch
    * is at-least-once) would silently DOUBLE-COUNT where the
    * sampler's set-semantics merge is idempotent. The MV therefore
    * carries the last applied batch id on every row (atomic with the
    * data under the same staged swap); a batch whose id is ≤ the
    * stored one is a no-op. Crash recovery composes: a COMPLETE
    * orphaned staging already carries its batch id, so promote-then-
    * replay hits the no-op branch; an incomplete staging is dropped
    * and the replay applies exactly once. */
  def applyHistBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val basePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(basePath)
    val mv = new org.apache.hadoop.fs.Path(basePath, "mv")
    val staging = new org.apache.hadoop.fs.Path(basePath, "mv_staging")
    val old = new org.apache.hadoop.fs.Path(basePath, "mv_old")
    val success = new org.apache.hadoop.fs.Path(staging, "_SUCCESS")
    if (fs.exists(success)) {
      fs.delete(mv, true); fs.rename(staging, mv)
    } else fs.delete(staging, true)
    fs.delete(old, true)
    // Empty micro-batch (append-mode watermark lag makes batch 0 empty
    // on EVERY first run): folding it would write a ZERO-ROW state MV,
    // and the next batch's replay check would then read a null
    // max(last_bid) — the r16 wedge. Skipping is replay-safe: an empty
    // batch's fold is a no-op, so re-applying it after a restart is too.
    if (batch.isEmpty) return
    val histB = Relational.histOf(batch)
    val merged =
      if (fs.exists(mv)) {
        val cur = spark.read.parquet(mv.toString)
        // null-safe: a zero-row MV (pre-fix deployments) must recover,
        // not NPE — treat it as "no batch applied yet"
        val lastRow = cur.agg(max(col("last_bid"))).head()
        if (!lastRow.isNullAt(0) && batchId <= lastRow.getLong(0))
          return // replayed batch — already folded
        cur.select(col("event_type"), col("bkt"), col("cnt"))
          .unionByName(histB)
          .groupBy(col("event_type"), col("bkt"))
          .agg(sum(col("cnt")).cast("long").as("cnt"))
          .withColumn("last_bid", lit(batchId))
      } else histB.withColumn("last_bid", lit(batchId))
    merged.coalesce(1).write.parquet(staging.toString)
    if (fs.exists(mv)) fs.rename(mv, old)
    fs.rename(staging, mv)
    fs.delete(old, true)
  }

  /** Always-on histogram maintenance: each micro-batch of raw events
    * folds into the per-(type, bucket) count MV. */
  def histSink(events: DataFrame, stateDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, bid: Long) =>
        applyHistBatch(b, stateDir, bid))
      .trigger(trigger)
      .start()

  /** Streaming CUSUM maintenance — the sequential face of
    * [[Relational.qCusum]] with the reference rate k = kNum/kDen
    * FIXED (the textbook deployment: k comes from a training window;
    * the batch query's mean-k needs the whole series). The closed
    * form s = p − min(0, min-prefix p) makes the detector a segment
    * MONOID, so one |types|-row state table suffices:
    * (last_h, p_end, min_p) folds a batch of CLOSED hourly counts as
    *   p_end' = p_end + Σ_seg d,
    *   min_p' = min(min_p, p_end + min-prefix_seg)
    * with d = c·kDen − kNum per hour and gap hours zero-filled
    * (d = −kNum) from the spine — a missing hour is a deviation,
    * never a missing row. Hours at or before last_h are DISCARDED
    * (the upstream watermark owns closed-ness — the streaming-dedup
    * convention); replayed batch ids are no-ops (the MV-maintenance
    * bookkeeping). State is |types| rows regardless of stream
    * volume; the in-batch fold is one type-keyed window over the
    * batch's own hours. */
  def applyCusumBatch(batch: DataFrame, stateDir: String,
      batchId: Long, kNum: Long, kDen: Long): Unit = {
    val spark = batch.sparkSession
    val basePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(basePath)
    val mv = new org.apache.hadoop.fs.Path(basePath, "mv")
    val staging = new org.apache.hadoop.fs.Path(basePath, "mv_staging")
    val old = new org.apache.hadoop.fs.Path(basePath, "mv_old")
    val success = new org.apache.hadoop.fs.Path(staging, "_SUCCESS")
    if (fs.exists(success)) {
      fs.delete(mv, true); fs.rename(staging, mv)
    } else fs.delete(staging, true)
    fs.delete(old, true)
    // Empty micro-batch — append mode emits NOTHING in batch 0 (the
    // watermark lags one batch), so the first real run of [[cusumSink]]
    // hits this with an empty frame. Folding it anyway would persist a
    // zero-row MV whose max(last_bid) is null and wedge every later
    // batch (and every restart, since the empty MV survives). Skipping
    // is replay-safe: an empty batch's fold is a no-op.
    if (batch.isEmpty) return
    val st: Option[DataFrame] =
      if (fs.exists(mv)) Some(spark.read.parquet(mv.toString)) else None
    for (cur <- st) {
      // null-safe: a zero-row MV (pre-fix deployments) must recover,
      // not NPE — treat it as "no batch applied yet"
      val lastRow = cur.agg(max(col("last_bid"))).head()
      if (!lastRow.isNullAt(0) && batchId <= lastRow.getLong(0))
        return // replayed batch — already folded
    }
    val state = st.map(_.select(col("event_type"), col("last_h"),
        col("p_end"), col("min_p")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, last_h BIGINT, p_end BIGINT, min_p BIGINT")))
    val rows = batch.select(col("event_type"), col("h").cast("long"),
      col("c").cast("long"))
    val keyed = rows.join(state, Seq("event_type"), "left")
      .filter(col("last_h").isNull || col("h") > col("last_h"))
    // zero-fill the gap from the state's last hour (new types start at
    // their own first hour — no synthetic history)
    val spine = keyed.groupBy(col("event_type"))
      .agg(coalesce(min(col("last_h")) + 1, min(col("h"))).as("h_from"),
        max(col("h")).as("h_to"))
      .select(col("event_type"),
        explode(sequence(col("h_from"), col("h_to"))).as("h"))
    val seg = spine.join(rows, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        (coalesce(col("c"), lit(0L)) * lit(kDen) - lit(kNum)).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val folded = seg
      .withColumn("lp", sum(col("d")).over(w))
      .withColumn("segmin", min(col("lp")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("h")).as("seg_last_h"),
        max_by(col("lp"), col("h")).as("seg_sum"),
        min(col("segmin")).as("seg_min"))
    val merged = folded.join(state, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("seg_last_h"), col("last_h")).as("last_h"),
        (coalesce(col("p_end"), lit(0L)) +
          coalesce(col("seg_sum"), lit(0L))).as("p_end"),
        when(col("seg_min").isNull, // untouched type: state rides along
          coalesce(col("min_p"), lit(Long.MaxValue)))
          .otherwise(least(coalesce(col("min_p"), lit(Long.MaxValue)),
            coalesce(col("p_end"), lit(0L)) + col("seg_min")))
          .as("min_p"))
      .withColumn("last_bid", lit(batchId))
    merged.coalesce(1).write.parquet(staging.toString)
    if (fs.exists(mv)) fs.rename(mv, old)
    fs.rename(staging, mv)
    fs.delete(old, true)
  }

  /** Always-on CUSUM maintenance over an event stream: hourly
    * tumbling counts close under the watermark (append mode emits a
    * window exactly once), and each closed batch folds into the
    * |types|-row detector state. */
  def cusumSink(events: DataFrame, stateDir: String,
      checkpointDir: String, kNum: Long, kDen: Long,
      watermarkDelay: String = "1 hour",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        expr("unix_micros(window.start) div 3600000000").as("h"),
        col("c"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, bid: Long) =>
        applyCusumBatch(b, stateDir, bid, kNum, kDen))
      .trigger(trigger)
      .start()

  /** The maintained detector readout: current CUSUM per type in
    * kDen-scaled units, s = p_end − min(0, min_p), with the alarm
    * at the caller's bar (same scale). */
  def loadCusum(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, alarmScaled: Long): DataFrame =
    spark.read.parquet(s"$stateDir/mv")
      .select(col("event_type"), col("last_h"),
        (col("p_end") - least(lit(0L), col("min_p"))).as("cusum_scaled"))
      .withColumn("alarm", col("cusum_scaled") > lit(alarmScaled))

  /** The maintained histogram in [[Relational.qHistQuantile]]'s exact
    * output shape (cumulative walk, median-bucket flag) — after the
    * stream has seen the whole corpus this row-equals the batch
    * query. */
  def loadHistQuantile(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    Relational.histQuantileOf(
      spark.read.parquet(s"$stateDir/mv")
        .select(col("event_type"), col("bkt"), col("cnt")))

  /** The maintained sample, in [[TextOps.qPrioritySample]]'s exact
    * output shape (rank split, τ, ŵ = max(w, τ)) — after the stream
    * has seen the whole corpus this row-equals the batch query. */
  def loadPrioritySample(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    TextOps.prioritySampleOf(spark.read.parquet(s"$stateDir/mv"))

  /** Read an [[annIndexAppend]]-maintained index back in the batch
    * build's canonical schema. `cid` rides the directory layout, so
    * the reader re-casts it (partition-value inference narrows to
    * int) and restores the canonical column order. Plain-path reads
    * are the PRE-CATALOG access; once [[registerAnnIndexTable]] has
    * run (and especially once a cell has been compacted, which flips
    * that partition's location to a sibling directory), the table is
    * the canonical reader. */
  def loadAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("vec_id"), col("v"), col("sigs"),
        col("cid").cast("long").as("cid"))

  /** Register an [[annIndexAppend]] directory as a cid-partitioned
    * EXTERNAL catalog table — the step that makes the reference-side
    * maintenance machinery apply to the ANN index verbatim: each
    * posting list (cell) is a catalog partition, so
    * [[Sinks.compactTablePartition]] compacts a cell's micro-batch
    * file grind with the SAME atomic location-flip protocol the Hive
    * event sink uses (and [[Sinks.reconcileLatePartition]] recovers
    * post-compaction appends the same way). Partition discovery
    * ignores the sink's `_spark_metadata`; re-running after more
    * cells appear just recovers the new partitions. */
  def registerAnnIndexTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE EXTERNAL TABLE $table
         |(vec_id BIGINT, v ARRAY<DOUBLE>, sigs ARRAY<BIGINT>)
         |PARTITIONED BY (cid BIGINT)
         |STORED AS PARQUET LOCATION '$dir'""".stripMargin)
    spark.catalog.recoverPartitions(table)
  }

  // ------------------------------------------------- bucketed state tables

  /** Shared crash-safe bucket-swap machinery for the two state-table
    * sinks ([[applyUpsertBatch]], [[applyRollupBatch]]). Protocol:
    * the merged replacement content for every touched bucket is
    * written to ONE staging dir, a `_STAGED` commit file marks the
    * write complete, then each staged bucket replaces its live dir
    * (delete + rename), and the staging dir is dropped. Every step
    * is resumable on replay:
    *  - staging WITHOUT `_STAGED` = a crashed write → discard it and
    *    re-merge from the live state (still untouched);
    *  - staging WITH `_STAGED` = a crashed swap → FINISH the swap
    *    from the staged content instead of re-merging (the staged
    *    data was derived from pre-swap state; re-merging against a
    *    half-swapped live state would double-apply partials on the
    *    rollup sink and read half-new state on the upsert);
    *  - a bucket already renamed away is skipped (its staged dir is
    *    gone).
    * This closes the delete-live→rename window that a naive swap
    * leaves open: with the staged dir still holding the bucket's
    * full replacement, a crash between the delete and the rename
    * cannot lose the bucket — replay resumes the rename. */
  private def bucketHash(keyCol: String, nb: Int) =
    pmod(xxhash64(col(keyCol)), lit(nb.toLong))

  private def stagingPath(basePath: org.apache.hadoop.fs.Path,
      tag: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      basePath.getParent, s".${basePath.getName}-$tag-staging")

  /** Rename every staged `kb=*` dir over its live sibling. Idempotent:
    * already-moved buckets are simply absent from the listing. Leaves
    * the staging dir (minus its bucket dirs) for the caller to drop
    * AFTER any commit marker it needs to write first. */
  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem,
      basePath: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path): Unit = {
    fs.mkdirs(basePath)
    fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("kb="))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(basePath, st.getPath.getName)
        fs.delete(live, true)
        fs.rename(st.getPath, live)
      }
  }

  /** If a COMMITTED staging survives from a crashed swap, finish it;
    * an uncommitted one is discarded. Returns true iff a committed
    * staging was (re-)applied. */
  private def resumeStagedSwap(fs: org.apache.hadoop.fs.FileSystem,
      basePath: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(staging)) return false
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, "_STAGED"))) {
      fs.delete(staging, true)
      return false
    }
    finishSwap(fs, basePath, staging)
    true
  }

  /** Write `merged` bucketed by `kb` into `staging` and commit it with
    * the `_STAGED` marker. The keyed repartition before the
    * partitioned write matters: without it every upstream task holds
    * rows of every bucket and the write emits tasks × buckets files
    * (measured 32 × 1024 at the MergeScale bootstrap); keyed
    * repartition gives each bucket ONE file — the file-count hygiene
    * the reference's rolling policy exists for. */
  private def writeStaged(merged: DataFrame, keyCol: String, nb: Int,
      staging: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    fs.delete(staging, true)
    merged
      .withColumn("kb", bucketHash(keyCol, nb))
      .repartition(nb, col("kb"))
      .write.partitionBy("kb").parquet(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, "_STAGED"), true).close()
  }

  /** Partition-pruned read of the touched buckets (empty frame with
    * `schema` when none exist yet). */
  private def readTouchedBuckets(spark: org.apache.spark.sql.SparkSession,
      basePath: org.apache.hadoop.fs.Path, existing: Seq[Long],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (existing.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(basePath.toString)
      .where(col("kb").isin(existing: _*)) // partition-pruned
      .drop("kb")

  /** Apply ONE change batch to a key-bucketed parquet state table
    * with MERGE semantics — the unit of work under [[upsertSink]],
    * callable directly for batch backfills. The base lives at
    * `baseDir` partitioned by `kb = pmod(xxhash64(key), nb)`; change
    * rows carry the base's schema plus a `seq` column (within-batch
    * ordering: the HIGHEST seq per key wins, then seq is dropped).
    *
    * Scale shape: only the buckets the batch's keys hash to are read
    * (partition-pruned scan over ≤ nb of the base's directories),
    * merged via [[Relational.mergeApply]] (base side of the merge
    * never shuffles; change batch broadcasts), and swapped in via the
    * crash-safe staged protocol above. The local-FS dir swap stands
    * in for the catalog-partition location flip
    * ([[Sinks.compactTablePartition]]'s S3A-safe protocol) a
    * metastore-backed deployment would use. Replay safety: a resumed
    * swap finishes from staging; a full re-delivery re-merges, and
    * MERGE is idempotent. */
  def applyUpsertBatch(batch: DataFrame, baseDir: String,
      nb: Int = 16, keyCol: String = "key"): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(conf)
    val staging = stagingPath(basePath, "upsert")
    // a committed staging from a crashed swap is finished first, so
    // the re-merge below reads fully post-swap live state
    if (resumeStagedSwap(fs, basePath, staging)) fs.delete(staging, true)
    if (batch.isEmpty) return
    // last change per key wins within the batch — max_by, not a
    // row_number window: the partial (map-side) aggregate means the
    // dedup shuffle carries one row per key per task, where a window
    // must shuffle the whole batch to sort it
    val valCols = batch.columns.filter(c => c != keyCol && c != "seq").toSeq
    val latest = batch.groupBy(col(keyCol))
      .agg(max_by(struct(valCols.map(col): _*), col("seq")).as("__w"))
      .select(col(keyCol) +: valCols.map(n => col(s"__w.$n").as(n)): _*)
    val touched = latest.select(bucketHash(keyCol, nb).as("kb")).distinct()
      .as[Long].collect().sorted // bounded by nb — never the corpus
    val existing = touched.filter(b =>
      fs.exists(new org.apache.hadoop.fs.Path(basePath, s"kb=$b")))
    // bootstrap fast path: with no existing buckets the merge is a
    // pure insert — skipping mergeApply matters because it BROADCASTS
    // the change side (right for a bounded CDC interval, wrong for a
    // multi-GB initial load)
    val merged =
      if (existing.isEmpty) latest
      else Relational.mergeApply(
        readTouchedBuckets(spark, basePath, existing, latest.schema),
        latest, keyCol).drop("op")
    writeStaged(merged, keyCol, nb, staging, fs)
    finishSwap(fs, basePath, staging)
    fs.delete(staging, true)
  }

  /** Apply ONE batch of rollup PARTIALS (gk, pn, psum) to a
    * kb-bucketed aggregate state table — the aggregation twin of
    * [[applyUpsertBatch]] and the streaming half of
    * [[Relational.qAggIncremental]]'s monoid claim: counts and
    * exact-decimal sums merge associatively, so stored ⊎ batch ≡ the
    * full recompute at every trigger, with only the touched buckets
    * read and rewritten.
    *
    * Unlike the upsert (whole-row replace, naturally idempotent),
    * ADDING partials twice double-counts — so replay protection is
    * layered: (a) a `_last_batch` marker records the highest applied
    * batch id and stale re-deliveries are skipped (foreachBatch
    * replays only the last uncommitted batch with a monotonic id);
    * (b) a crashed swap is FINISHED from its committed staging
    * rather than re-merged — re-merging against half-swapped state
    * is exactly the double-count window — and the marker is written
    * BEFORE the staging dir is dropped, so every crash point lands
    * on a resumable side of the protocol. Contract: the state dir is
    * bound to ONE checkpoint lineage — foreachBatch ids restart at 0
    * under a fresh checkpoint, so reusing a state dir with a new
    * checkpoint must start from a fresh dir too (stale-id skips are
    * logged, not silent). */
  def applyRollupBatch(partials: DataFrame, baseDir: String,
      batchId: Long, nb: Int = 16): Unit = {
    val spark = partials.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(basePath, "_last_batch")
    val staging = stagingPath(basePath, "rollup")
    def lastApplied: Long =
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    def writeMarker(): Unit = {
      val out = fs.create(marker, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
    if (batchId <= lastApplied) {
      // replayed-but-committed batch: nothing to apply; drop any
      // staging left between the marker write and the staging delete
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"rollup state $baseDir: skipping already-applied batch " +
          s"$batchId (marker $lastApplied) — a FRESH checkpoint over " +
          "an existing state dir restarts ids at 0 and would land " +
          "here; pair a new checkpoint with a new state dir")
      fs.delete(staging, true)
      return
    }
    if (resumeStagedSwap(fs, basePath, staging)) {
      // crashed swap of THIS batch (an older batch would have written
      // the marker before dropping its staging): finished above —
      // record it and stop; re-merging would double-count
      writeMarker()
      fs.delete(staging, true)
      return
    }
    if (partials.isEmpty) { writeMarker(); return }
    val touched = partials.select(bucketHash("gk", nb).as("kb")).distinct()
      .as[Long].collect().sorted
    val existing = touched.filter(b =>
      fs.exists(new org.apache.hadoop.fs.Path(basePath, s"kb=$b")))
    val merged = readTouchedBuckets(spark, basePath, existing,
        partials.schema)
      .unionByName(partials)
      .groupBy(col("gk"))
      .agg(sum(col("pn")).cast("long").as("pn"),
        sum(col("psum")).cast("decimal(18,4)").as("psum"))
    writeStaged(merged, "gk", nb, staging, fs)
    finishSwap(fs, basePath, staging)
    writeMarker()
    fs.delete(staging, true)
  }

  /** The rollup state table's replay watermark — −1 when the table
    * has never committed a batch. Shared by [[applyRollupBatch]] and
    * the admission sink (which must skip a fully committed batch
    * BEFORE recomputing admission against already-updated totals). */
  private[engine] def rollupLastApplied(
      spark: org.apache.spark.sql.SparkSession, baseDir: String): Long = {
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(basePath, "_last_batch")
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Apply ONE micro-batch of documents under a persistent per-source
    * TOKEN budget — streaming admission control, the always-on half
    * of [[TextOps.qTokenBudgetMix]]: each source may contribute at
    * most `budget` tokens ACROSS THE WHOLE STREAM, tracked in a
    * [[applyRollupBatch]] state table (gk = source, psum = admitted
    * tokens). Within a batch, docs are taken in (event_time, doc_id)
    * order — the deterministic stand-in for arrival order — while
    * used + running total stays within budget; a doc that would
    * overflow is dropped whole, and admission is FIRST-COME (the
    * batch pass's md5 permutation needs the whole corpus; a stream
    * only ever has the past).
    *
    * Replay safety: admitted docs land in an overwrite-per-batch
    * directory (`batch=<id>` — re-delivery rewrites the identical
    * content), and the state update rides applyRollupBatch's marker;
    * a batch whose state already committed is skipped WHOLE, so a
    * replay can never recompute admission against its own totals. */
  def admitBudgetBatch(batch: DataFrame, stateDir: String, outDir: String,
      budget: Long, batchId: Long, nb: Int = 4): Unit = {
    val spark = batch.sparkSession
    if (rollupLastApplied(spark, stateDir) >= batchId) return
    val basePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val used =
      if (!fs.exists(basePath) || fs.listStatus(basePath)
          .forall(!_.getPath.getName.startsWith("kb=")))
        spark.emptyDataFrame
          .select(lit("").as("source"), lit(0L).as("used"))
          .limit(0)
      else spark.read.parquet(stateDir)
        .select(col("gk").as("source"), col("psum").cast("long").as("used"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("event_time"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // persisted: the manifest write, the state-table partials and
    // applyRollupBatch's several bookkeeping actions all consume this
    // frame — without the pin EVERY action re-executes the whole
    // micro-batch plan (source re-read, features, dedup state lookup,
    // the admission window), which measured as a ~5 s/batch fixed tax
    // in the composed StreamCurationJob (r20 StreamScale probe). The
    // pinned frame is admitted (doc_id, source, ntk) rows only.
    val admitted = batch
      .withColumn("ntk", TextOps.tokenCount(col("text")).cast("long"))
      .withColumn("cum", sum(col("ntk")).over(w))
      .join(used, Seq("source"), "left")
      .filter(col("cum") + coalesce(col("used"), lit(0L)) <= budget)
      .select(col("doc_id"), col("source"), col("ntk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      applyRollupBatch(
        admitted.groupBy(col("source").as("gk"))
          .agg(count(lit(1)).as("pn"),
            sum(col("ntk")).cast("decimal(18,4)").as("psum")),
        stateDir, batchId, nb)
    } finally admitted.unpersist()
  }

  /** The streaming driver for [[admitBudgetBatch]]: docs carrying
    * (doc_id, source, text, event_time) flow through the budget gate
    * one micro-batch at a time. */
  def budgetAdmissionSink(docs: DataFrame, stateDir: String,
      outDir: String, checkpointDir: String, budget: Long, nb: Int = 4,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        admitBudgetBatch(b, stateDir, outDir, budget, id, nb)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming rollup maintenance: keep a materialized aggregate
    * continuously up to date from the event stream — one
    * [[applyRollupBatch]] merge per micro-batch, where `partials`
    * reduces a raw micro-batch to (gk, pn, psum) partial-aggregate
    * rows (the batch side of the monoid). The Kappa-style
    * materialized view: the stored table is always the full-history
    * rollup, no history rescan, no unbounded state store — state
    * lives in the table itself. */
  def rollupSink(stream: DataFrame, partials: DataFrame => DataFrame,
      baseDir: String, checkpointDir: String, nb: Int = 16,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyRollupBatch(partials(b), baseDir, id, nb)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming CDC upsert sink: apply a stream of change rows to the
    * [[applyUpsertBatch]] state table, one merge per micro-batch —
    * the `foreachBatch` pattern that stands in for MERGE INTO when
    * the sink is plain parquet. Re-running a failed batch re-applies
    * the SAME merge to the already-merged buckets, and MERGE is
    * idempotent (matched rows re-take the same values, inserts are
    * then matches) — so the sink is effectively-once without a
    * transaction log, on top of the checkpoint's at-least-once. */
  def upsertSink(changes: DataFrame, baseDir: String,
      checkpointDir: String, nb: Int = 16, keyCol: String = "key",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyUpsertBatch(b, baseDir, nb, keyCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming transition maintenance — the incremental half of
    * [[Relational.qTransitionMatrix]]: per-user (prev type → next
    * type) steps emitted as events arrive, with the LAST event per
    * user carried as keyed state so steps connect ACROSS triggers.
    * Within a micro-batch the group's arrivals sort by (ts,
    * event_id) — the batch pass's exact tie order; the stored last
    * event prepends to the chain. Counting the emitted steps
    * reproduces the batch matrix whenever arrival order respects
    * event time across triggers (the spec's sliced-file case); a
    * late-but-admitted event whose (ts, event_id) PRECEDES the
    * stored chain head is DETECTED — state keeps the head's order
    * key, not just its type — and the cross-trigger link is skipped
    * rather than fabricated in arrival order: emitted steps are then
    * a strict subset of the batch matrix's (never a step the batch
    * pass wouldn't count), the skip observable as a
    * `graft.transition.skippedLinks` metric on the query progress —
    * the reconciliation signal ADVICE r14 asked for — with the batch
    * pass as the exact reconciliation, the same horizon caveat as
    * [[nearDupStream]].
    *
    * State is ONE (event_type, tsNanos, event_id) triple per ACTIVE
    * user (the chain head plus its batch-pass order key), evicted by
    * event-time timeout `idleEvictMillis` past the user's last event
    * (an evicted user's next event starts a fresh chain — dropping
    * the one linking step, never fabricating one). Shuffle: the
    * single user-keyed exchange every stateful op pays. */
  def transitionStream(events: DataFrame,
      watermarkDelay: String = "10 minutes",
      idleEvictMillis: Long = 3600000L): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    // full sub-millisecond precision: the batch pass orders by the
    // micros-resolution timestamp, so the in-batch sort must too —
    // getTime alone truncates to millis and would break the tie
    // order for same-user same-millisecond events
    def tsNanos(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
    val skipped = events.sparkSession.sparkContext
      .longAccumulator("graft.transition.skippedLinks")
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      .as[UserEvent]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long, Long), TransitionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[UserEvent],
            state: GroupState[(String, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (tsNanos(e.ts), e.event_id))
            val types = batch.map(_.event_type)
            val head = batch.head
            val hTs = tsNanos(head.ts)
            val chain = state.getOption match {
              case Some((t, sTs, sId))
                  if sTs < hTs || (sTs == hTs && sId <= head.event_id) =>
                t +: types
              case Some(_) =>
                // stored head post-dates the admitted batch head:
                // linking would invert event-time order — drop the
                // cross-trigger step (subset-of-batch guarantee)
                // and count it so drift is observable
                skipped.add(1L)
                types
              case None => types
            }
            val out = chain.zip(chain.drop(1))
              .map { case (a, b) => TransitionOut(uid, a, b) }
            val last = batch.last
            state.update(
              (last.event_type, tsNanos(last.ts), last.event_id))
            state.setTimeoutTimestamp(last.ts.getTime + idleEvictMillis)
            out.iterator
          }
      }
  }

  /** Streaming SCD2 maintenance — the incremental half of
    * [[Relational.qScd2]]: CLOSED validity intervals emitted as
    * state changes arrive; the OPEN interval (the batch pass's
    * valid_to IS NULL row) lives in keyed state until the next
    * change closes it — append mode cannot retract, so the stream
    * emits the closed-interval LOG and the current row is a state
    * lookup. Replayed in event-time order, the emitted set equals
    * the batch build's closed rows EXACTLY (the spec's sliced-
    * replay claim); consecutive same-state events collapse within
    * and across triggers. Same chain-head order key, order-
    * violation SKIP (subset-of-batch, counted on the
    * `graft.scd2.skippedLinks` accumulator) and event-time
    * eviction discipline as [[transitionStream]] — an evicted
    * user's open interval is dropped, never fabricated closed.
    * Shuffle: the single user-keyed exchange. */
  def scd2Stream(events: DataFrame,
      watermarkDelay: String = "10 minutes",
      idleEvictMillis: Long = 3600000L): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    def tsNanos(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
    // the batch op emits unix_micros(ts); micros = nanos floor-div
    // 1000 matches it bit-for-bit (timestamps carry micro precision)
    def tsMicros(t: java.sql.Timestamp): Long =
      math.floorDiv(tsNanos(t), 1000L)
    val skipped = events.sparkSession.sparkContext
      .longAccumulator("graft.scd2.skippedLinks")
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      .as[UserEvent]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long, Long, Long), Scd2Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[UserEvent],
            state: GroupState[(String, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (tsNanos(e.ts), e.event_id))
            val head = batch.head
            val hTs = tsNanos(head.ts)
            // open interval carried from previous triggers, dropped
            // (counted) when the admitted batch head predates the
            // stored chain head — closing an interval at an earlier
            // ts than it opened would fabricate history
            var cur: Option[(String, Long)] = state.getOption match {
              case Some((st, from, lTs, lId))
                  if lTs < hTs || (lTs == hTs && lId <= head.event_id) =>
                Some((st, from))
              case Some(_) =>
                skipped.add(1L)
                None
              case None => None
            }
            val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Out]
            batch.foreach { e =>
              cur match {
                case Some((st, from)) if st != e.event_type =>
                  out += Scd2Out(uid, st, from, tsMicros(e.ts))
                  cur = Some((e.event_type, tsMicros(e.ts)))
                case Some(_) => ()
                case None => cur = Some((e.event_type, tsMicros(e.ts)))
              }
            }
            val last = batch.last
            val (cs, cf) = cur.get
            state.update((cs, cf, tsNanos(last.ts), last.event_id))
            state.setTimeoutTimestamp(last.ts.getTime + idleEvictMillis)
            out.iterator
          }
      }
  }

  /** Streaming last-touch attribution — the always-on twin of
    * [[Relational.qAttribution]]: each arriving purchase is emitted
    * with its user's most recent STRICTLY-prior click/view within
    * `windowSec`, or NULL attribution (organic) when the latest
    * touch is stale or absent. State is ONE (touch_id, touch_type,
    * touch_t_us, lastTsNanos, lastEventId) record per ACTIVE user —
    * the carried touch plus the chain-head order key; same
    * conventions as [[transitionStream]]/[[scd2Stream]]: in-batch
    * micros-precision (ts, event_id) sort, order-violation SKIP
    * (a batch whose head predates the stored horizon drops the
    * carried touch rather than attributing against the future,
    * counted on `graft.attribution.skippedCarries`), event-time
    * eviction (an evicted user's next purchase is organic — a
    * dropped attribution, never a fabricated one). Replayed in
    * event-time order the emitted rows equal the batch pass exactly
    * (the sliced-replay spec). Shuffle: the single user-keyed
    * exchange. */
  def attributionStream(events: DataFrame,
      windowSec: Long = Relational.attributionWindowSec,
      watermarkDelay: String = "10 minutes",
      idleEvictMillis: Long = 86400000L): Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    def tsNanos(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
    def tsMicros(t: java.sql.Timestamp): Long =
      math.floorDiv(tsNanos(t), 1000L)
    val skipped = events.sparkSession.sparkContext
      .longAccumulator("graft.attribution.skippedCarries")
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
      .as[ValuedEvent]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, String, Long, Long, Long),
          AttributionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[ValuedEvent],
            state: GroupState[(Long, String, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (tsNanos(e.ts), e.event_id))
            val head = batch.head
            val hTs = tsNanos(head.ts)
            // carried touch; touch_id = -1 encodes "none" in the
            // state tuple (state encoders want flat primitives)
            var touch: Option[(Long, String, Long)] =
              state.getOption match {
                case Some((tid, tty, tus, lTs, lId))
                    if lTs < hTs || (lTs == hTs && lId <= head.event_id) =>
                  if (tid >= 0) Some((tid, tty, tus)) else None
                case Some(_) =>
                  skipped.add(1L)
                  None
                case None => None
              }
            val out =
              scala.collection.mutable.ArrayBuffer.empty[AttributionOut]
            batch.foreach { e =>
              if (e.event_type == "purchase") {
                val pUs = tsMicros(e.ts)
                val fresh =
                  touch.filter(t => pUs - t._3 <= windowSec * 1000000L)
                out += AttributionOut(e.event_id, uid, pUs, e.value,
                  fresh.map(_._1), fresh.map(_._2),
                  fresh.map(t => (pUs - t._3) / 1000000L))
              }
              if (e.event_type == "click" || e.event_type == "view")
                touch = Some((e.event_id, e.event_type, tsMicros(e.ts)))
            }
            val last = batch.last
            val (tid, tty, tus) = touch.getOrElse((-1L, "", 0L))
            state.update((tid, tty, tus, tsNanos(last.ts), last.event_id))
            state.setTimeoutTimestamp(last.ts.getTime + idleEvictMillis)
            out.iterator
          }
      }
  }

  /** Arbitrary keyed state: sessionization with an event-time timeout.
    * Per uuid, accumulate (count, min ts, max ts); when the watermark
    * passes last-seen + gap, the session closes and one summary row is
    * emitted. State is a 3-long tuple per active key — the
    * mapGroupsWithState pattern for logic windows can't express. */
  def sessionize(events: Dataset[TimedEvent],
      gapMillis: Long = 30000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "5 seconds")
      .groupByKey(_.uuid)
      .flatMapGroupsWithState[(Long, Long, Long), SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uuid: String, it: Iterator[TimedEvent],
            state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, lo, hi) = state.get
            state.remove()
            Iterator.single(SessionOut(uuid, n, hi - lo))
          } else {
            val ts = it.map(_.event_time.getTime).toSeq
            val (n0, lo0, hi0) = state.getOption.getOrElse((0L, Long.MaxValue, Long.MinValue))
            val next = (n0 + ts.size, math.min(lo0, ts.min), math.max(hi0, ts.max))
            state.update(next)
            state.setTimeoutTimestamp(next._3 + gapMillis)
            Iterator.empty
          }
      }
  }
}
