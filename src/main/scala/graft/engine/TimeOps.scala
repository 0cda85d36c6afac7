package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar time/string derivations — the complete expression surface of
  * the reference (SURVEY.md §2.7, F1–F6), re-expressed as codegen'd
  * built-in Catalyst expressions (no UDFs anywhere).
  *
  * Reference sites (yhyyz/emr-flink-example):
  *  - F1/F2/F3: `Kafka2S3Hive.scala:69` —
  *    `TO_TIMESTAMP(FROM_UNIXTIME(\`timestamp\`/1000, 'yyyy-MM-dd HH:mm:ss'))`
  *  - F4: `Kafka2S3Hive.scala:123-125` — `DATE_FORMAT(ts, 'yyyy-MM-dd'|'HH'|'mm')`
  *  - F5: `Kafka2S3Parquet.scala:27-34` — ISO date string → `yyyyMMdd`, "error" fallback
  *  - F6: `Kafka2S3Text.scala:54-58` — processing-time day in UTC+8
  */
object TimeOps {

  /** F3 — epoch millis → epoch seconds with Flink/Hive *integer*
    * division semantics (`BIGINT/1000` truncates). Spark's `/` returns
    * DOUBLE; cast-to-long truncates toward zero which matches integer
    * division for the non-negative epochs this pipeline sees. Kept as
    * arithmetic (not floor) so it stays inside whole-stage codegen.
    */
  def epochMillisToSecs(millis: Column): Column =
    (millis / lit(1000)).cast("long")

  /** F1 ∘ F2 ∘ F3 — the reference's computed event-time column:
    * epoch-millis BIGINT → TIMESTAMP, truncated to whole seconds
    * (the 'yyyy-MM-dd HH:mm:ss' round-trip drops sub-second precision;
    * we reproduce that by converting whole seconds only).
    */
  def eventTimeFromMillis(millis: Column): Column =
    to_timestamp(from_unixtime(epochMillisToSecs(millis)))

  /** F4 — the three Hive partition values derived from a timestamp. */
  def logday(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def hourOf(ts: Column): Column = date_format(ts, "HH")
  def minuteOf(ts: Column): Column = date_format(ts, "mm")

  /** F5 — event-date bucket: ISO-8601 string → `yyyyMMdd`, mirroring
    * the reference assigner (`Kafka2S3Parquet.scala:27-34`) exactly:
    * `date.split("T")` is empty — which in Java happens only for a
    * non-empty string made entirely of 'T's ("T", "TT", …; trailing
    * empty segments are removed) — → "error"; everything else takes
    * the pre-T prefix with '-' stripped, so "" → "" and garbage
    * prefixes pass through verbatim. One documented improvement: a
    * null `date` (reference would NPE and kill the job) also lands in
    * the "error" bucket.
    */
  def isoDateBucket(isoDate: Column): Column =
    when(isoDate.isNull || isoDate.rlike("^T+$"), lit("error"))
      .otherwise(regexp_replace(substring_index(isoDate, "T", 1), "-", ""))

  /** F6 — processing-time day in UTC+8, `yyyyMMdd`. In streaming,
    * `current_timestamp()` is the micro-batch timestamp — the
    * documented stand-in for Flink's per-record processing time.
    */
  def processingDayUtc8(): Column =
    date_format(from_utc_timestamp(current_timestamp(), "UTC+8"), "yyyyMMdd")

  /** Same derivation for a supplied (testable) processing-time column. */
  def processingDayUtc8(procTime: Column): Column =
    date_format(from_utc_timestamp(procTime, "UTC+8"), "yyyyMMdd")
}
