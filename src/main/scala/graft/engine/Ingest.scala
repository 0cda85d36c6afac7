package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ad-event record (README.md:8-12 of the reference;
  * case class at `Kafka2S3Parquet.scala:22`):
  * `{"uuid":..., "date": ISO-8601 string, "timestamp": epoch millis,
  *   "ad_type": int, "ad_type_name": string}`
  */
case class AdEvent(
    uuid: String,
    date: String,
    timestamp: Long,
    ad_type: Int,
    ad_type_name: String)

/** Sources + JSON decode (SURVEY.md §2.1 S1/S2, §2.2 P1).
  *
  * The reference reads a Kafka topic of JSON strings and either keeps
  * them opaque (`Kafka2S3Text`), fastjson-parses them strictly
  * (`Kafka2S3Parquet`), or decodes them leniently via Flink SQL's JSON
  * format (`Kafka2S3Hive`, `'json.ignore-parse-errors'='true'`). Here
  * all three decode modes are `from_json` with the matching parse mode,
  * which keeps the decode inside whole-stage codegen and lets Catalyst
  * prune unreferenced JSON fields into the parser.
  */
object Ingest {

  val adEventSchema: StructType = Encoders.product[AdEvent].schema

  /** S1 — Kafka raw-string source (streaming). Spark tracks offsets in
    * its own checkpoint WAL (not the Kafka consumer group), which is
    * what gives end-to-end exactly-once with file sinks.
    *
    * NOT executable in this environment, by construction: running it
    * needs the `spark-sql-kafka-0-10` connector and `kafka-clients`
    * (an embedded broker would additionally need the kafka server
    * artifacts), and none of these exist in `/opt/spark/jars` or the
    * offline dependency cache — verified by listing both (round 7);
    * with zero egress they cannot be fetched, so even an in-process
    * broker test is impossible, not merely unattempted. The format
    * string resolves at RUNTIME (this compiles fine), and every
    * downstream operator is exercised through [[fileRaw]], whose plan
    * past the source is identical.
    */
  def kafkaRaw(spark: SparkSession, brokers: String, topic: String,
      groupId: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** File-based streaming stand-in for the Kafka topic: a directory of
    * JSON-lines files read incrementally. Used by the test suite (no
    * Kafka broker in this environment); identical downstream plan.
    */
  def fileRaw(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .load(dir)
      .toDF("value")

  /** P1 / F7 — lenient decode (`Kafka2S3Hive.scala:77-78`): missing
    * fields → null ('json.fail-on-missing-field'='false'), corrupt
    * records dropped entirely ('json.ignore-parse-errors'='true' —
    * Flink's JSON deserializer *skips* rows it cannot parse, it does
    * not emit null rows). PERMISSIVE from_json emits an all-null
    * struct (NOT a null struct) for corrupt input, so a bare
    * `isNotNull` filter would keep ghost rows: we add the
    * `_corrupt_record` field to the parse schema and drop rows where
    * it is set — the exact drop-on-parse-error row counts of the
    * reference.
    */
  def parseLenient(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val lenientSchema = adEventSchema.add("_corrupt_record", StringType)
    raw.select(from_json(col(jsonCol), lenientSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("d"))
      .filter(col("d").isNotNull && col("d._corrupt_record").isNull)
      .select(col("d.uuid"), col("d.date"), col("d.timestamp"),
        col("d.ad_type"), col("d.ad_type_name"))
  }

  /** F7 strict variant — fastjson semantics
    * (`Kafka2S3Parquet.scala:70-73`): malformed JSON throws (FAILFAST),
    * but a *missing* field does not — fastjson materializes JVM
    * primitive defaults into the case class (`ad_type` → 0,
    * `timestamp` → 0L; object fields stay null). Coalesce the
    * primitives so partial records match Kafka2S3Parquet's output. */
  def parseStrict(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(
      from_json(col(jsonCol), adEventSchema, Map("mode" -> "FAILFAST")).as("d"))
      .select(
        col("d.uuid").as("uuid"),
        col("d.date").as("date"),
        coalesce(col("d.timestamp"), lit(0L)).as("timestamp"),
        coalesce(col("d.ad_type"), lit(0)).as("ad_type"),
        col("d.ad_type_name").as("ad_type_name"))

  /** The reference's full Hive-insert projection
    * (`Kafka2S3Hive.scala:114-127`): 5 physical columns + 3 partition
    * columns derived from event time.
    */
  def withPartitionColumns(parsed: DataFrame): DataFrame = {
    val et = TimeOps.eventTimeFromMillis(col("timestamp"))
    parsed.select(
      col("uuid"), col("date"), col("ad_type"), col("ad_type_name"),
      col("timestamp"),
      TimeOps.logday(et).as("logday"),
      TimeOps.hourOf(et).as("h"),
      TimeOps.minuteOf(et).as("m"))
  }

  /** Batch twin of the streaming pipeline over the `events` test table:
    * treat `props` as the Kafka JSON payload, decode leniently, derive
    * the (logday, h, m) partition columns from event time. This is the
    * DuckDB-checkable slice (SURVEY.md §7.2).
    */
  def eventsPartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    ev.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        TimeOps.logday(col("ts")).as("logday"),
        TimeOps.hourOf(col("ts")).as("h"),
        TimeOps.minuteOf(col("ts")).as("m"))
      .orderBy(col("event_id"))
  }
}
